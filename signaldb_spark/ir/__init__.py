from .model import IRValidationError, validate  # noqa: F401
from .planner import lower  # noqa: F401
