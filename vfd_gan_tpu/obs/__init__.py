from vfd_gan_tpu.obs.summary import RunDirs, SummaryLogger, make_run_dirs
from vfd_gan_tpu.obs.profiling import StepTimer, profile_trace

__all__ = ["RunDirs", "SummaryLogger", "make_run_dirs", "StepTimer",
           "profile_trace"]
