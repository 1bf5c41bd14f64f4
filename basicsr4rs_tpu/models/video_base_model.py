"""VideoBaseModel — frame-wise video validation with per-folder metrics
(reference: basicsr/models/video_base_model.py:15-160)."""

from __future__ import annotations

from collections import Counter, OrderedDict
from os import path as osp

import numpy as np

from ..metrics import calculate_metric
from ..utils.img_util import imwrite, tensor2img
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .sr_model import SRModel


@MODEL_REGISTRY.register()
class VideoBaseModel(SRModel):
    """Sliding-window video SR model: each item is a frame window, output is
    the center frame."""

    def _dummy_input(self):
        import jax.numpy as jnp
        num_in_ch = self.opt['network_g'].get('num_in_ch', 3)
        # DUF/TOF have no num_frame network arg — their frame count lives in
        # the dataset opt (reference options/train/DUF style configs).
        num_frame = self.opt['network_g'].get('num_frame')
        if num_frame is None:
            train_ds = (self.opt.get('datasets') or {}).get('train') or {}
            num_frame = train_ds.get('num_frame', 5)
        return jnp.zeros((1, num_frame, 16, 16, num_in_ch), jnp.float32)

    @staticmethod
    def _collate_single(item):
        """``dataset[idx]`` -> batch-of-1, like the default collate
        (the reference's manual ``unsqueeze_(0)``, video_base_model.py:64-70)."""
        out = {}
        for k, v in item.items():
            if isinstance(v, np.ndarray) or hasattr(v, 'ndim'):
                out[k] = np.asarray(v)[None]
            else:
                out[k] = [v]
        return out

    def _init_folder_metric_results(self, dataset):
        """Zero-filled (num_frames, num_metrics) array per folder; every
        process allocates the FULL set so the cross-process sum merges
        disjoint strides (reference video_base_model.py:49-62)."""
        num_frame_each_folder = Counter(dataset.data_info['folder'])
        self.metric_results_per_folder = {
            folder: np.zeros((num_frame, len(self.opt['val']['metrics'])), np.float32)
            for folder, num_frame in num_frame_each_folder.items()
        }

    def _merge_metric_results(self):
        """Sum-merge the per-folder metric arrays across processes with one
        collective (reference dist.reduce loop, video_base_model.py:103-111)."""
        from ..utils.dist_util import sum_across_processes
        folders = sorted(self.metric_results_per_folder)
        flat = np.concatenate([self.metric_results_per_folder[f] for f in folders], axis=0)
        merged = sum_across_processes(flat)
        offset = 0
        for f in folders:
            n = self.metric_results_per_folder[f].shape[0]
            self.metric_results_per_folder[f] = merged[offset:offset + n]
            offset += n

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """Frame-strided distributed validation: each process evaluates
        frames ``idx = rank::world_size`` of the flat dataset and fills its
        rows of the zero-initialized per-folder metric arrays; the arrays are
        sum-merged across processes and process 0 reports (reference
        video_base_model.py:46-111)."""
        rank = self.opt.get('rank', 0)
        world_size = self.opt.get('world_size', 1)
        dataset = dataloader.dataset
        dataset_name = dataset.opt['name']
        with_metrics = self.opt['val'].get('metrics') is not None
        if with_metrics:
            self._init_folder_metric_results(dataset)
            self._initialize_best_metric_results(dataset_name)

        for i in range(rank, len(dataset), world_size):
            self._validate_frame_item(self._collate_single(dataset[i]),
                                      dataset_name, save_img, with_metrics)

        if with_metrics:
            self._merge_metric_results()
            if rank == 0:
                self._log_video_metrics(current_iter, dataset_name, tb_logger)

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        dataset = dataloader.dataset
        dataset_name = dataset.opt['name']
        with_metrics = self.opt['val'].get('metrics') is not None

        if with_metrics:
            self._init_folder_metric_results(dataset)
            self._initialize_best_metric_results(dataset_name)

        for val_data in dataloader:
            self._validate_frame_item(val_data, dataset_name, save_img, with_metrics)

        if with_metrics:
            self._log_video_metrics(current_iter, dataset_name, tb_logger)

    def _validate_frame_item(self, val_data, dataset_name, save_img, with_metrics):
        """Evaluate one frame-window item and record its metric row."""
        folder = val_data['folder'][0]
        frame_idx, max_idx = val_data['idx'][0].split('/')

        self.feed_data(val_data)
        self.test()
        visuals = self.get_current_visuals()
        result_img = tensor2img(visuals['result'])
        if isinstance(result_img, list):
            result_img = result_img[0]
        metric_data = {'img': result_img}
        if 'gt' in visuals:
            gt_img = tensor2img(visuals['gt'])
            if isinstance(gt_img, list):
                gt_img = gt_img[0]
            metric_data['img2'] = gt_img

        if save_img:
            if self.opt['is_train']:
                raise NotImplementedError('saving image is not supported during training.')
            if 'vimeo' in dataset_name.lower():
                split_result = val_data['lq_path'][0].split('/')
                img_name = f'{split_result[-3]}_{split_result[-2]}_{split_result[-1].split(".")[0]}'
            else:
                img_name = osp.splitext(osp.basename(val_data['lq_path'][0]))[0]
            if self.opt['val'].get('suffix'):
                save_img_path = osp.join(self.opt['path']['visualization'], dataset_name, folder,
                                         f"{img_name}_{self.opt['val']['suffix']}.png")
            else:
                save_img_path = osp.join(self.opt['path']['visualization'], dataset_name, folder,
                                         f"{img_name}_{self.opt['name']}.png")
            imwrite(result_img, save_img_path)

        if with_metrics:
            for metric_idx, opt_ in enumerate(self.opt['val']['metrics'].values()):
                result = calculate_metric(metric_data, opt_)
                self.metric_results_per_folder[folder][int(frame_idx), metric_idx] = result

    def _log_video_metrics(self, current_iter, dataset_name, tb_logger):
        """Average per folder and overall (reference video_base_model.py:113-160)."""
        logger = get_root_logger()
        metric_names = list(self.opt['val']['metrics'].keys())
        # per-folder average over frames
        metric_results_avg = {folder: folder_res.mean(axis=0)
                              for folder, folder_res in self.metric_results_per_folder.items()}
        total_avg = np.stack(list(metric_results_avg.values())).mean(axis=0)
        self.metric_results = {name: float(total_avg[i]) for i, name in enumerate(metric_names)}
        for name, value in self.metric_results.items():
            self._update_best_metric_result(dataset_name, name, value, current_iter)

        log_str = f'Validation {dataset_name}\n'
        for metric_idx, name in enumerate(metric_names):
            log_str += f'\t # {name}: {total_avg[metric_idx]:.4f}'
            for folder, folder_avg in metric_results_avg.items():
                log_str += f'\t # {folder}: {folder_avg[metric_idx]:.4f}'
            if dataset_name in self.best_metric_results:
                record = self.best_metric_results[dataset_name][name]
                log_str += f'\n\t    Best: {record["val"]:.4f} @ {record["iter"]} iter'
            log_str += '\n'
        logger.info(log_str)
        if tb_logger:
            for metric_idx, name in enumerate(metric_names):
                tb_logger.add_scalar(f'metrics/{name}', float(total_avg[metric_idx]), current_iter)
                for folder, folder_avg in metric_results_avg.items():
                    tb_logger.add_scalar(f'metrics/{name}/{folder}',
                                         float(folder_avg[metric_idx]), current_iter)


@MODEL_REGISTRY.register()
class EDVRModel(VideoBaseModel):
    """EDVR training specifics (reference: basicsr/models/edvr_model.py:7-62):
    TSA-only warm-up (``tsa_iter``) and a dcn lr multiplier."""

    def __init__(self, opt):
        super().__init__(opt)
        if self.is_train:
            self.tsa_iter = opt['train'].get('tsa_iter', 0)
            self.dcn_lr_mul = opt['train'].get('dcn_lr_mul', 1.0)

    def _postprocess_updates(self, updates, params, step):
        import jax
        import jax.numpy as jnp

        def scale(path, u):
            names = [getattr(p, 'key', str(p)) for p in path]
            is_dcn = any('dcn' in n for n in names)
            is_tsa = any(n == 'fusion' for n in names)
            u = u * (self.dcn_lr_mul if is_dcn else 1.0)
            if self.tsa_iter:
                # during warm-up, only TSA fusion trains; all params train AT
                # current_iter == tsa_iter = step + 1 (reference
                # edvr_model.py:30-52)
                u = jnp.where(jnp.logical_or(step + 1 >= self.tsa_iter, is_tsa), u, 0.)
            return u

        return jax.tree_util.tree_map_with_path(scale, updates)
