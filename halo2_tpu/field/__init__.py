from . import bn254, limbs, mont
from .mont import FQ, FR, FieldSpec

__all__ = ["bn254", "limbs", "mont", "FR", "FQ", "FieldSpec"]
