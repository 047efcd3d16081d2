from lsqrrecipes_tpu.utils.random import RandomNumberGenerator
from lsqrrecipes_tpu.utils.profiling import Timer, throughput

__all__ = ["RandomNumberGenerator", "Timer", "throughput"]
