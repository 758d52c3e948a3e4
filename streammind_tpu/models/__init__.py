from . import mamba, mistral, projector, vit
