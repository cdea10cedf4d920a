from .superstep import SuperstepDriver, SuperstepResult, latest_committed

__all__ = ["SuperstepDriver", "SuperstepResult", "latest_committed"]
