"""Worker for the REAL 2-process distributed test (VERDICT r2 #3).

Launched twice (rank 0/1) by tests/test_models/test_two_process_distributed.py
with a local coordinator; each process owns 4 virtual CPU devices of an
8-device world. Exercises, for the first time in an actually-multi-process
runtime (not rank-simulation):

  A. ``sum_across_processes``'s ``process_allgather`` branch
     (utils/dist_util.py) — the reference ``dist.reduce`` analog.
  B. A jitted data-parallel train step on the GLOBAL mesh: per-process
     local batches assembled via ``jax.make_array_from_process_local_data``
     (parallel/mesh.py), two optimization steps, loss must match the
     single-process run bit-for-bit-ish.
  C. Folder-strided video ``dist_validation`` with the REAL cross-process
     metric merge (reference video_recurrent_model.py:92-98 striding +
     video_base_model.py:103-111 reduce).

Writes a rank{r}.json with all results for the parent to assert on.
"""

import json
import os
import sys


SR_OPT = """
name: twoproc_sr
model_type: SRModel
scale: 4
num_gpu: 8
manual_seed: 0
is_train: true
dist: true
rank: 0
world_size: 1
network_g: {type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 2, upscale: 4}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0.999
  optim_g: {type: Adam, lr: !!float 1e-3}
  scheduler: {type: ConstantLR}
  total_iter: 100
  pixel_opt: {type: L1Loss, loss_weight: 1.0, reduction: mean}
val: {val_freq: 100}
"""

VID_OPT = """
name: twoproc_vid
model_type: VideoRecurrentModel
scale: 4
num_gpu: 8
manual_seed: 0
is_train: true
dist: true
rank: 0
world_size: 1
network_g: {type: BasicVSR, num_feat: 8, num_block: 1}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0
  optim_g: {type: Adam, lr: !!float 1e-3}
  scheduler: {type: ConstantLR}
  total_iter: 100
  pixel_opt: {type: CharbonnierLoss, loss_weight: 1.0, reduction: mean}
val:
  val_freq: 100
  metrics:
    psnr: {type: calculate_psnr, crop_border: 0}
"""


def main():
    rank, port, outdir, vidroot = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4])
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ.pop('PALLAS_AXON_POOL_IPS', None)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2 and jax.device_count() == 8
    assert jax.local_device_count() == 4

    import numpy as np
    from basicsr4rs_tpu.utils.dist_util import get_dist_info, sum_across_processes
    from basicsr4rs_tpu.utils.options import yaml_load
    from basicsr4rs_tpu.models import build_model

    out = {'rank_world': list(get_dist_info())}

    # --- A: cross-process sum-reduce (disjoint strides -> full vector)
    arr = np.zeros((6,), np.float32)
    arr[rank::2] = (np.arange(6, dtype=np.float32) + 1.)[rank::2]
    out['sum'] = sum_across_processes(arr).tolist()

    # --- B: global-mesh train step from process-local batch halves
    model = build_model(yaml_load(SR_OPT))
    rngb = np.random.RandomState(0)
    full = {'lq': rngb.rand(8, 8, 8, 3).astype(np.float32),
            'gt': rngb.rand(8, 32, 32, 3).astype(np.float32)}
    local = {k: v[rank * 4:(rank + 1) * 4] for k, v in full.items()}
    model.feed_data(local)
    assert model.batch['lq'].shape[0] == 8, 'local halves must assemble globally'
    assert len(model.batch['lq'].sharding.device_set) == 8
    model.optimize_parameters(1)
    out['l_pix'] = float(model.get_current_log()['l_pix'])
    model.feed_data(local)
    model.optimize_parameters(2)
    out['l_pix2'] = float(model.get_current_log()['l_pix'])

    # --- B2: cross-process checkpoint save/resume round-trip (VERDICT r3 #5;
    # reference base_model.py:321-374). Rank 0 saves (@master_only) the
    # step-2 state, a real allgather acts as the barrier, then BOTH ranks
    # resume a FRESH model from the shared filesystem and the post-resume
    # trajectory must equal the uninterrupted one bit-for-bit.
    model.opt['path']['models'] = os.path.join(outdir, 'models')
    model.opt['path']['training_states'] = os.path.join(outdir, 'states')
    if rank == 0:
        os.makedirs(model.opt['path']['models'], exist_ok=True)
        os.makedirs(model.opt['path']['training_states'], exist_ok=True)
    model.save(epoch=0, current_iter=2)
    sum_across_processes(np.ones((1,), np.float32))  # save-visible barrier
    model.feed_data(local)
    model.optimize_parameters(3)
    out['l_pix3_uninterrupted'] = float(model.get_current_log()['l_pix'])
    model.feed_data(local)
    model.optimize_parameters(4)
    out['l_pix4_uninterrupted'] = float(model.get_current_log()['l_pix'])

    model2 = build_model(yaml_load(SR_OPT))
    model2.opt['path']['models'] = model.opt['path']['models']
    model2.opt['path']['training_states'] = model.opt['path']['training_states']
    resume_state = model2.load_training_state(
        os.path.join(model.opt['path']['training_states'], '2.state'))
    model2.resume_training(resume_state)
    out['resumed_step'] = int(model2.current_step())
    # network checkpoint loads and matches the live params on both ranks
    net_tree = model2.load_network(
        os.path.join(model.opt['path']['models'], 'net_g_2'),
        param_key='params', template=model2.state.params)
    flat_live = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, model2.state.params))
    flat_ckpt = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, net_tree))
    out['net_ckpt_bitexact'] = bool(all(
        np.array_equal(a, b) for a, b in zip(flat_live, flat_ckpt)))
    model2.feed_data(local)
    model2.optimize_parameters(3)
    out['l_pix3_resumed'] = float(model2.get_current_log()['l_pix'])
    model2.feed_data(local)
    model2.optimize_parameters(4)
    out['l_pix4_resumed'] = float(model2.get_current_log()['l_pix'])

    # --- C: folder-strided video dist_validation, real metric merge
    from basicsr4rs_tpu.data import build_dataset
    from basicsr4rs_tpu.models.video_base_model import VideoBaseModel

    ds = build_dataset({'name': 'VidRec', 'type': 'VideoRecurrentTestDataset',
                        'phase': 'val', 'scale': 4,
                        'dataroot_gt': os.path.join(vidroot, 'gt'),
                        'dataroot_lq': os.path.join(vidroot, 'lq'),
                        'io_backend': {'type': 'disk'}, 'num_frame': -1,
                        'cache_data': True})

    class _Loader:
        def __init__(self, dataset):
            self.dataset = dataset

        def __iter__(self):
            for i in range(len(self.dataset)):
                yield VideoBaseModel._collate_single(self.dataset[i])

    vmodel = build_model(yaml_load(VID_OPT))
    vmodel.opt['rank'], vmodel.opt['world_size'] = get_dist_info()
    vmodel.dist_validation(_Loader(ds), current_iter=1, tb_logger=None,
                           save_img=False)
    out['val'] = {k: np.asarray(v).tolist()
                  for k, v in vmodel.metric_results_per_folder.items()}

    with open(os.path.join(outdir, f'rank{rank}.json'), 'w') as f:
        json.dump(out, f)
    print(f'rank{rank}: OK', flush=True)


if __name__ == '__main__':
    main()
