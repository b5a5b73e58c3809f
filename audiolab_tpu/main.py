"""Server entry point (reference: main.py — CLI flags --listen/--port/
--api-only, logging setup with per-lib silencing, graceful shutdown).

The UI layer of the reference is Gradio (not available in this image); the
full REST surface is served regardless, mirroring the reference's
--api-only mode.
"""

from __future__ import annotations

import argparse
import logging
import signal
import sys


def setup_logging() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s][%(name)s][%(levelname)s] %(message)s",
    )
    for noisy in ("jax", "jax._src", "urllib3", "matplotlib", "PIL"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser("audiolab_tpu")
    parser.add_argument("--listen", action="store_true", help="bind 0.0.0.0")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--api-only", action="store_true", help="REST only (default: also UI when available)")
    parser.add_argument("--output-root", default="outputs/process")
    parser.add_argument(
        "--demo-backends", action="store_true",
        help="register random-weight generation backends (tts/music/"
             "transcribe) so every endpoint is live without checkpoints")
    args = parser.parse_args(argv)

    setup_logging()
    log = logging.getLogger("audiolab_tpu")

    # persistent XLA compilation cache: first-compile through the TPU tunnel
    # is minutes-slow; restarts reuse executables
    import os

    import jax

    cache_dir = os.environ.get("AUDIOLAB_JAX_CACHE", "/tmp/audiolab_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from audiolab_tpu.serve.api import create_app
    from audiolab_tpu.serve.http import make_handler

    router = create_app(output_root=args.output_root)

    if args.demo_backends:
        log.info("loading demo (random-weight) backends")
        from audiolab_tpu.pipelines.acestep import random_acestep
        from audiolab_tpu.pipelines.music import random_stable_audio
        from audiolab_tpu.pipelines.transcribe import random_transcriber
        from audiolab_tpu.pipelines.tts import (
            random_chatterbox,
            random_xtts,
            random_zonos,
        )
        from audiolab_tpu.models.yue import random_yue
        from audiolab_tpu.serve import music_api, transcribe_api, tts_api

        # tiny demo models pin the WHOLE process to the CPU backend:
        # instant startup + instant requests (TPU tunnel compiles are
        # minutes-slow and pointless at this scale); real deployments load
        # converted weights and leave the default device alone
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        tts_api.register_backend("zonos", random_zonos())
        tts_api.register_backend("coqui", random_xtts())
        tts_api.register_backend("chatterbox", random_chatterbox())
        music_api.register_backend("stable_audio", random_stable_audio())
        music_api.register_backend("acestep", random_acestep())
        music_api.register_backend("yue", random_yue())
        transcribe_api.register_backend("whisper", random_transcriber())

    host = "0.0.0.0" if args.listen else "127.0.0.1"

    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer((host, args.port), make_handler(router))

    def shutdown(_sig, _frame):
        log.info("shutting down")
        import threading

        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGINT, shutdown)
    signal.signal(signal.SIGTERM, shutdown)

    log.info("serving on http://%s:%d (api at /api/v1)", host, args.port)
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
