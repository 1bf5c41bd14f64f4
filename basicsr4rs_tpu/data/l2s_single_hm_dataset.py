"""L2S datasets with histogram-matched Sentinel targets
(reference: basicsr/data/l2s_single_hm_dataset.py:17-144)."""

from __future__ import annotations

from ..utils.registry import DATASET_REGISTRY
from .l2s_single_dataset import L2SSingleDataset, L2SSingleSplitDataset


@DATASET_REGISTRY.register()
class L2SSingleHMDataset(L2SSingleDataset):
    """GT comes from the histogram-matched sentinel (``sentinel_hm``), with
    quality filtering by ``metric_hm.json``."""
    gt_source = 'sentinel_hm'
    use_hm_metrics = True


@DATASET_REGISTRY.register()
class L2SSingleHMSplitDataset(L2SSingleSplitDataset):
    """(reference :128-144)"""
    base_class = L2SSingleHMDataset
