from audiolab_tpu.serve.api import create_app
from audiolab_tpu.serve.http import Router, serve_forever

__all__ = ["create_app", "Router", "serve_forever"]
