from . import domain, ntt
from .domain import Domain, get_domain
from .ntt import intt, ntt as fft, powers_table

__all__ = ["domain", "ntt", "Domain", "get_domain", "fft", "intt", "powers_table"]
