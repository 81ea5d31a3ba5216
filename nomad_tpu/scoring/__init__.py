from .csvio import build_result_frames, file_label, write_results
from .engine import EmbeddingEngine, bucket_length, list_dir_files

__all__ = [
    "EmbeddingEngine",
    "bucket_length",
    "build_result_frames",
    "file_label",
    "list_dir_files",
    "write_results",
]
