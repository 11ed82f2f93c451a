from .keygen import ProvingKey, VerifyingKey, keygen
from .prover import create_proof
from .verifier import verify_proof

__all__ = ["keygen", "ProvingKey", "VerifyingKey", "create_proof", "verify_proof"]
