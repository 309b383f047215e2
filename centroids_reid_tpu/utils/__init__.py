from .profiling import annotate, profile_trace, step_marker
from .seeding import seed_everything

__all__ = ["annotate", "profile_trace", "step_marker", "seed_everything"]
