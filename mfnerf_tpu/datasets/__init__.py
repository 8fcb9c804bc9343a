"""Dataset registry. Parity: reference datasets/__init__.py:8-12."""
from .nerf import NeRFDataset
from .nsvf import NSVFDataset
from .colmap import ColmapDataset
from .nerfpp import NeRFPPDataset
from .rtmv import RTMVDataset

dataset_dict = {
    'nerf': NeRFDataset,
    'nsvf': NSVFDataset,
    'colmap': ColmapDataset,
    'nerfpp': NeRFPPDataset,
    'rtmv': RTMVDataset,
}
