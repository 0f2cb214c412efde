from gcn_maxcut_tpu.utils.logging import get_logger
from gcn_maxcut_tpu.utils.timing import Timer, PhaseTimer

__all__ = ["get_logger", "Timer", "PhaseTimer"]
