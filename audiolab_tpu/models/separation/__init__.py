from audiolab_tpu.models.separation.roformer import BSRoformer, RoformerConfig
from audiolab_tpu.models.separation.mdx import MDXNet, MDXConfig

__all__ = ["BSRoformer", "RoformerConfig", "MDXNet", "MDXConfig"]
