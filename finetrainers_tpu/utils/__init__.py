from .args_config import ArgsConfigMixin
from .file import delete_files, find_files, string_to_filename
from .memory import bytes_to_gigabytes, get_memory_statistics
from .serialization import safetensors_load_dict, safetensors_save_dict
from .timing import Timer
