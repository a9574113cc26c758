"""Dataset sources/sinks (SURVEY.md §2.1)."""

from .images import read_images, list_image_files

__all__ = ["read_images", "list_image_files"]
