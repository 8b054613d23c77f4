from .state import StateStore
from .frontier import FrontierScheduler, FrontierConfig
from .oracle import OracleCrawler

__all__ = ["StateStore", "FrontierScheduler", "FrontierConfig", "OracleCrawler"]
