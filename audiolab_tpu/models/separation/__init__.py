from audiolab_tpu.models.separation.roformer import BSRoformer, RoformerConfig
from audiolab_tpu.models.separation.mdx import MDXNet, MDXConfig
from audiolab_tpu.models.separation.mdx23c import MDX23CConfig, TFCTDFNetV3

__all__ = ["BSRoformer", "RoformerConfig", "MDXNet", "MDXConfig",
           "MDX23CConfig", "TFCTDFNetV3"]
