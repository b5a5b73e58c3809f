import time, sys, functools
import jax, jax.numpy as jnp, numpy as np
from audiolab_tpu.kernels.attention import attention_reference, flash_attention

dev = jax.devices()[0]
rng = np.random.default_rng(0)
N = 20

def timeit(fn, args, reps=3):
    @jax.jit
    def chained(q, k, v):
        def body(i, q):
            return fn(q, k, v).astype(q.dtype)
        return jnp.sum(jax.lax.fori_loop(0, N, body, q).astype(jnp.float32))
    float(chained(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        s = float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N

def mk(shape):
    return tuple(jax.device_put(jnp.asarray(
        rng.standard_normal(shape).astype(np.float32) * 0.2).astype(jnp.bfloat16), dev)
        for _ in range(3))

which = sys.argv[1] if len(sys.argv) > 1 else "band"
if which == "band":
    qkv = mk((5520, 8, 62, 64))
    t_ref = timeit(attention_reference, qkv)
    print(f"band xla: {t_ref*1e3:7.2f} ms", file=sys.stderr)
    for bh in (16, 64):
        t_p = timeit(functools.partial(flash_attention, block_q=64, block_k=64, block_h=bh), qkv)
        print(f"band bh={bh:3d}: {t_p*1e3:7.2f} ms", file=sys.stderr)
else:
    qkv = mk((496, 8, 690, 64))
    for bh, bq in ((2, 768), (4, 768)):
        t_p = timeit(functools.partial(flash_attention, block_q=bq, block_k=768, block_h=bh), qkv)
        print(f"time bh={bh} bq={bq}: {t_p*1e3:7.2f} ms", file=sys.stderr)
