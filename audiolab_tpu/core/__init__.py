from audiolab_tpu.core.audio_io import read_audio, write_audio
from audiolab_tpu.core.chunking import ChunkPlan, plan_chunks, stitch_chunks
from audiolab_tpu.core.mesh import get_mesh, local_mesh

__all__ = [
    "read_audio",
    "write_audio",
    "ChunkPlan",
    "plan_chunks",
    "stitch_chunks",
    "get_mesh",
    "local_mesh",
]
