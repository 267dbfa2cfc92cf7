from .config import BiEARConfig
from .biear import (
    build_model_active,
    build_model_active_single_controller,
    build_model,
    active_forward,
    passive_forward,
)
from .auralnet import build_model_auralnet_active, auralnet_forward
