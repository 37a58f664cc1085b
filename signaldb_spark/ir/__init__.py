from .metrics import lower_metrics  # noqa: F401
from .model import IRValidationError, validate  # noqa: F401
from .planner import lower  # noqa: F401
