from v2pe_tpu.utils.diagnostics import nan_guard, assert_finite
from v2pe_tpu.utils.profiling import profile_trace, StepTimer

__all__ = ["nan_guard", "assert_finite", "profile_trace", "StepTimer"]
