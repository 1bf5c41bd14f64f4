"""VideoRecurrentModel — whole-sequence training/eval
(reference: basicsr/models/video_recurrent_model.py:15-197)."""

from __future__ import annotations

from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import calculate_metric
from ..utils.img_util import imwrite, tensor2img
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .video_base_model import VideoBaseModel


@MODEL_REGISTRY.register()
class VideoRecurrentModel(VideoBaseModel):
    """Items carry whole folders; flow-net lr multiplier + freeze-for-N-iters
    are applied as update masks inside the jitted step (the functional analog
    of the reference's param groups + requires_grad toggling, :22-64)."""

    def __init__(self, opt):
        self.fix_flow_iter = opt.get('train', {}).get('fix_flow', 0) if opt.get('train') else 0
        self.flow_lr_mul = opt.get('train', {}).get('flow_lr_mul', 1.0) if opt.get('train') else 1.0
        super().__init__(opt)

    def _dummy_input(self):
        # >= 64px: keeps the 6-level SpyNet pyramid non-degenerate AND
        # satisfies BasicVSR++'s minimum low-res input size
        # (basicvsrpp_arch.py:117; reference asserts the same)
        num_in_ch = self.opt['network_g'].get('num_in_ch', 3)
        return jnp.zeros((1, 2, 64, 64, num_in_ch), jnp.float32)

    def _postprocess_updates(self, updates, params, step):
        # reference semantics (video_recurrent_model.py:24-46,52-61):
        # lr multiplier applies to 'spynet' params ONLY; the warm-up freeze
        # covers 'spynet' and 'edvr' (IconVSR's keyframe extractor).
        def scale(path, u):
            names = [getattr(p, 'key', str(p)) for p in path]
            is_flow = any('spynet' in n for n in names)
            is_fixed = is_flow or any('edvr' in n for n in names)
            if is_flow and self.flow_lr_mul != 1.0:
                u = u * self.flow_lr_mul
            if self.fix_flow_iter and is_fixed:
                # state.step is pre-increment: current_iter = step + 1; the
                # reference unfreezes AT current_iter == fix_flow_iter (:60)
                u = jnp.where(step + 1 >= self.fix_flow_iter, u, 0.)
            return u

        return jax.tree_util.tree_map_with_path(scale, updates)

    def test(self):
        """Whole-sequence inference with optional flip-sequence TTA and
        center-frame-only output (reference :176-195)."""
        lq = self.batch['lq']
        flip_seq = self.opt['val'].get('flip_seq', False)
        if flip_seq:
            lq = jnp.concatenate([lq, lq[:, ::-1]], axis=1)
        output = self._eval_apply(self._test_params(), lq)
        if flip_seq:
            n = output.shape[1] // 2
            output_1 = output[:, :n]
            output_2 = output[:, n:][:, ::-1]
            output = 0.5 * (output_1 + output_2)
        if self.opt['val'].get('center_frame_only', False):
            output = output[:, output.shape[1] // 2]
        self.output = output

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """Folder-strided distributed validation: rank r evaluates folders
        ``r::world_size``. When the folder count doesn't divide evenly, the
        tail ranks re-evaluate the last folder WITHOUT recording, so every
        process executes the same number of steps and stays in lockstep for
        the final collective (reference video_recurrent_model.py:92-98
        anti-deadlock padding). Results are sum-merged; process 0 reports."""
        rank = self.opt.get('rank', 0)
        world_size = self.opt.get('world_size', 1)
        dataset = dataloader.dataset
        dataset_name = dataset.opt['name']
        with_metrics = self.opt['val'].get('metrics') is not None
        if with_metrics:
            self._init_folder_metric_results(dataset)
            self._initialize_best_metric_results(dataset_name)

        num_folders = len(dataset)
        num_pad = (world_size - num_folders % world_size) % world_size
        if rank == 0 and num_pad:
            get_root_logger().info(
                f'{num_pad} padding folders added to keep validation in lockstep')
        for i in range(rank, num_folders + num_pad, world_size):
            idx = min(i, num_folders - 1)
            val_data = self._collate_single(dataset[idx])
            self._validate_folder_item(val_data, dataset_name, save_img,
                                       with_metrics, record=i < num_folders)

        if with_metrics:
            self._merge_metric_results()
            if rank == 0:
                self._log_video_metrics(current_iter, dataset_name, tb_logger)

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """Folder-per-item validation (reference :66-174)."""
        dataset = dataloader.dataset
        dataset_name = dataset.opt['name']
        with_metrics = self.opt['val'].get('metrics') is not None

        if with_metrics:
            self._init_folder_metric_results(dataset)
            self._initialize_best_metric_results(dataset_name)

        for val_data in dataloader:
            self._validate_folder_item(val_data, dataset_name, save_img, with_metrics)

        if with_metrics:
            self._log_video_metrics(current_iter, dataset_name, tb_logger)

    def _validate_folder_item(self, val_data, dataset_name, save_img,
                              with_metrics, record=True):
        """Run inference on one whole-folder item; record metric rows and/or
        save frames unless this is a lockstep-padding replay."""
        folder = val_data['folder'][0]
        self.feed_data(val_data)
        self.test()
        visuals = self.get_current_visuals()
        result = visuals['result'][0]    # (t, H, W, C)
        gt = visuals.get('gt')
        gt = gt[0] if gt is not None else None
        if self.opt['val'].get('center_frame_only', False):
            # test() squeezed the time axis; restore a 1-frame axis so the
            # single center frame lands in metric row 0 (reference :120-123)
            result = result[None]
            if gt is not None:
                gt = gt[None] if gt.ndim == 3 else gt[gt.shape[0] // 2][None]
        if not record:
            return

        for frame_idx in range(result.shape[0]):
            result_img = tensor2img(result[frame_idx])
            metric_data = {'img': result_img}
            if gt is not None:
                metric_data['img2'] = tensor2img(gt[frame_idx])
            if save_img:
                save_path = osp.join(self.opt['path']['visualization'], dataset_name, folder,
                                     f'{frame_idx:08d}_{self.opt["name"]}.png')
                imwrite(result_img, save_path)
            if with_metrics:
                for metric_idx, opt_ in enumerate(self.opt['val']['metrics'].values()):
                    self.metric_results_per_folder[folder][frame_idx, metric_idx] = (
                        calculate_metric(metric_data, opt_))


def _flatten_frames(x):
    """(B, T, H, W, C) -> (B*T, H, W, C) for the frame discriminator."""
    if x.ndim == 5:
        b, t = x.shape[:2]
        return x.reshape(b * t, *x.shape[2:])
    return x


from .srgan_model import SRGANModel  # noqa: E402


@MODEL_REGISTRY.register()
class VideoRecurrentGANModel(SRGANModel, VideoRecurrentModel):
    """GAN over the recurrent model (reference video_recurrent_gan_model.py:12).
    MRO: training setup from SRGANModel; sequence eval from
    VideoRecurrentModel; D sees frames flattened over (B, T)."""

    def _g_gan_loss(self, output, gt, d_params, d_stats):
        fake_g_pred, _ = self._d_apply(d_params, d_stats, _flatten_frames(output), train=True)
        return self.cri_gan(fake_g_pred, True, is_disc=False)

    def _d_losses(self, d_params, d_stats, gt, output_detached):
        from collections import OrderedDict
        real_d_pred, d_stats = self._d_apply(d_params, d_stats, _flatten_frames(gt), train=True)
        l_d_real = self.cri_gan(real_d_pred, True, is_disc=True)
        fake_d_pred, d_stats = self._d_apply(d_params, d_stats,
                                             _flatten_frames(output_detached), train=True)
        l_d_fake = self.cri_gan(fake_d_pred, False, is_disc=True)
        logs = OrderedDict(l_d_real=l_d_real, l_d_fake=l_d_fake,
                           out_d_real=jnp.mean(real_d_pred), out_d_fake=jnp.mean(fake_d_pred))
        return l_d_real + l_d_fake, logs, d_stats


@MODEL_REGISTRY.register()
class VideoGANModel(SRGANModel, VideoBaseModel):
    """GAN over the sliding-window video model (reference video_gan_model.py:7)."""
