from bsmr_sddmm_tpu.utils.checkdata import check_data, CheckResult
from bsmr_sddmm_tpu.utils.logger import RunLog
from bsmr_sddmm_tpu.utils.timing import time_jitted

__all__ = ["check_data", "CheckResult", "RunLog", "time_jitted"]
