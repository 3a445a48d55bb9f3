from .buckets import get_bucket_for_image_size
from .dataset import FileItem, FolderDataset
from .loader import DataLoader, build_dataloader

__all__ = [
    "get_bucket_for_image_size",
    "FileItem",
    "FolderDataset",
    "DataLoader",
    "build_dataloader",
]
