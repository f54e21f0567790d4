"""elaina-tpu: TPU-native Walk-on-Stars PDE solver with neural guiding.

Public API surface (see README.md for the architecture and the component
map to the reference implementation).
"""

__version__ = "0.1.0"

from .core.config import ExperimentConfig, IntegratorSettings  # noqa: F401
from .core.problem import Boundary, Problem, Scene, SourceGrid  # noqa: F401


def run(conf_path: str):
    """Run an experiment config (equivalent of `python -m elaina_tpu run`)."""
    from .exec import run_expr

    return run_expr(conf_path)
