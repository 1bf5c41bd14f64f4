"""SRRSModel — remote-sensing SR base model
(reference: basicsr/models/srrs_model.py:17-253).

TPU translations of the reference behaviors:
  * AMP autocast + GradScaler -> bfloat16 compute policy (``network_g.dtype:
    bfloat16`` in configs) — TPUs need no loss scaling, and non-finite-update
    skipping is provided by ``optax.apply_if_finite`` wrapping the optimizer
    (the reference's NaN/Inf skip-step, :65-77).
  * per-image metric rows -> pandas CSV in the visualization dir (:162-216)
  * [-1, 1]-convention visuals; RGB/NIR split PNG saving (``rswrite``, :224)
"""

from __future__ import annotations

from collections import OrderedDict
from os import path as osp

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..metrics import calculate_metric
from ..utils.img_util import imwrite, minusone_one_tensor_to_ubyte_numpy
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .base_model import build_optimizer
from .lr_scheduler import build_schedule
from .sr_model import SRModel


@MODEL_REGISTRY.register()
class SRRSModel(SRModel):

    def setup_optimizers(self):
        # Wrap the optimizer so non-finite updates are skipped in-graph
        # (reference skips the step on NaN/Inf loss, srrs_model.py:65-77).
        train_opt = self.opt['train']
        optim_opt = dict(train_opt['optim_g'])
        base_lr = optim_opt.get('lr', 2e-4)
        schedule = build_schedule(base_lr, train_opt.get('scheduler'),
                                  train_opt.get('warmup_iter', -1))
        tx = build_optimizer(optim_opt, schedule)
        self.tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
        self.schedulers_info = [('g', schedule)]
        self.use_amp = train_opt.get('use_amp', False)
        if self.use_amp and self.opt['network_g'].get('dtype') is None:
            get_root_logger().info('use_amp: set network_g.dtype=bfloat16 for the TPU '
                                   'mixed-precision analog (no loss scaling needed).')

        from .base_model import TrainState
        from ..parallel.mesh import replicate
        ema_params = (jax.tree_util.tree_map(jnp.array, self.params)
                      if self.ema_decay > 0 else None)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=self.params,
                           ema_params=ema_params, opt_state=self.tx.init(self.params),
                           stats=self.net_stats)
        self.state = replicate(state, self.mesh)

    # ----------------------------------------------------------- validation
    def _extract_img_name(self, val_data: dict) -> str:
        lq_path = val_data['lq_path'][0]
        return (osp.basename(lq_path.split(',')[0]) if lq_path.endswith('.taco')
                else osp.splitext(osp.basename(lq_path))[0])

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """Per-image CSV metrics + RS visual saving (reference :96-216)."""
        import pandas as pd
        dataset_name = dataloader.dataset.opt['name']
        with_metrics = self.opt['val'].get('metrics') is not None

        if with_metrics:
            if not hasattr(self, 'metric_results'):
                self.metric_results = {m: 0 for m in self.opt['val']['metrics'].keys()}
            self._initialize_best_metric_results(dataset_name)
            self.metric_results = {m: 0 for m in self.metric_results}
            df = pd.DataFrame()

        cnt = 0
        for val_data in dataloader:
            img_name = self._extract_img_name(val_data)
            self.feed_data(val_data)
            self.test()

            visuals = self.get_current_visuals()
            converted = {}
            for name, tensor in visuals.items():
                if tensor is not None:
                    img = minusone_one_tensor_to_ubyte_numpy(tensor, rgb2bgr=False)
                    converted[name] = img[0] if isinstance(img, list) else img
            sr_img = converted.get('result')
            gt_img = converted.get('gt')

            if save_img:
                self._save_visuals(dataset_name, img_name, converted)

            if with_metrics and gt_img is not None:
                metric_data = {'img': sr_img, 'img2': gt_img}
                for name, opt_ in self.opt['val']['metrics'].items():
                    score = calculate_metric(metric_data, opt_)
                    df.loc[img_name, name] = score
                    self.metric_results[name] += score
            cnt += 1

        if with_metrics and cnt > 0:
            self._save_metrics_csv(dataset_name, current_iter, df)
            for metric in self.metric_results.keys():
                self.metric_results[metric] /= cnt
                self._update_best_metric_result(dataset_name, metric,
                                                self.metric_results[metric], current_iter)
            self._log_validation_metric_values(current_iter, dataset_name, tb_logger)

    def _save_visuals(self, dataset: str, img_name: str, images: dict):
        """RGB + NIR band-split saving (reference :220-240)."""
        vis_path = self.opt['path']['visualization']
        rgb, nir = {}, {}
        for name, img in images.items():
            if img is None:
                continue
            rgb[name] = img[..., :3]
            if img.shape[-1] > 3:
                nir[name] = img[..., 3:4]
        self.rswrite(osp.join(vis_path, 'RGB', dataset, img_name), rgb, is_rgb_order=True)
        if nir:
            self.rswrite(osp.join(vis_path, 'NIR', dataset, img_name), nir, is_rgb_order=False)

    def _save_metrics_csv(self, dataset: str, iter_num, df):
        import os
        os.makedirs(self.opt['path']['visualization'], exist_ok=True)
        df.to_csv(osp.join(self.opt['path']['visualization'], f'{dataset}_{iter_num}.csv'))

    def rswrite(self, folder: str, filename_dict: dict, is_rgb_order: bool):
        """(reference :224-246)"""
        for key, value in filename_dict.items():
            save_file_path = osp.join(folder, f'{key}.png')
            if not osp.exists(save_file_path) and value is not None:
                img = cv2.cvtColor(value, cv2.COLOR_RGB2BGR) if (is_rgb_order and value.shape[-1] == 3) else value
                imwrite(img, save_file_path)
