"""Data / eval subpackage (datasets, metrics, RLE, loaders)."""
from .metrics import (  # noqa: F401
    AnimeMangaMetric, coco_map, coco_summary,
)
