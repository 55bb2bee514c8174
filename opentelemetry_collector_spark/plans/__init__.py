from .config import CollectorConfig, ConfigError, load_config
from .compiler import BatchPipelineRunner

__all__ = ["CollectorConfig", "ConfigError", "load_config", "BatchPipelineRunner"]
