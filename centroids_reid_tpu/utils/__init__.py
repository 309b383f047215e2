from .cache import enable_compile_cache
from .preemption import PreemptionGuard
from .profiling import annotate, profile_trace, step_marker
from .seeding import seed_everything

__all__ = [
    "enable_compile_cache",
    "PreemptionGuard",
    "annotate",
    "profile_trace",
    "step_marker",
    "seed_everything",
]
