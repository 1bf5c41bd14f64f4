from .color_util import bgr2ycbcr, rgb2ycbcr, rgb2ycbcr_jax, ycbcr2bgr, ycbcr2rgb
from .dist_util import get_dist_info, get_device_info, init_dist, is_master, master_only
from .download_util import download_file_from_google_drive, load_file_from_url
from .flow_util import dequantize_flow, flowread, flowwrite, quantize_flow
from .img_util import (crop_border, imfrombytes, img2tensor, imwrite,
                       minusone_one_tensor_to_ubyte_numpy, tensor2img)
from .logger import AvgTimer, MessageLogger, get_env_info, get_root_logger, init_tb_logger, init_wandb_logger
from .matlab_functions import imresize
from .misc import (check_resume, find_latest_checkpoint_iter, get_time_str, make_exp_dirs,
                   mkdir_and_rename, scandir, sizeof_fmt)
from .options import copy_opt_file, dict2str, ordered_yaml, parse_options, set_random_seed, yaml_load
from .registry import ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY, METRIC_REGISTRY, MODEL_REGISTRY, Registry

__all__ = [
    # color_util
    'bgr2ycbcr', 'rgb2ycbcr', 'rgb2ycbcr_jax', 'ycbcr2bgr', 'ycbcr2rgb',
    # dist_util
    'get_dist_info', 'get_device_info', 'init_dist', 'is_master', 'master_only',
    # img_util
    'crop_border', 'imfrombytes', 'img2tensor', 'imwrite',
    'minusone_one_tensor_to_ubyte_numpy', 'tensor2img',
    # logger
    'AvgTimer', 'MessageLogger', 'get_env_info', 'get_root_logger',
    'init_tb_logger', 'init_wandb_logger',
    # matlab_functions
    'imresize',
    # misc
    'check_resume', 'find_latest_checkpoint_iter', 'get_time_str', 'make_exp_dirs',
    'mkdir_and_rename', 'scandir', 'sizeof_fmt',
    # options
    'copy_opt_file', 'dict2str', 'ordered_yaml', 'parse_options', 'set_random_seed', 'yaml_load',
    # registry
    'ARCH_REGISTRY', 'DATASET_REGISTRY', 'LOSS_REGISTRY', 'METRIC_REGISTRY', 'MODEL_REGISTRY', 'Registry',
]
