from tpu_rag.utils.env import load_dotenv, env_str, env_int, env_float, env_bool
from tpu_rag.utils.timing import Timer, StageTimings

__all__ = [
    "load_dotenv",
    "env_str",
    "env_int",
    "env_float",
    "env_bool",
    "Timer",
    "StageTimings",
]
