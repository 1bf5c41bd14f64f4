"""REAL 2-process distributed execution (VERDICT r2 #3).

Round 2 validated rank-striding by simulation only; this launches TWO
actually-separate ``jax.distributed.initialize``'d CPU processes (local
coordinator, 4 virtual devices each = one 8-device world) and asserts:

  * ``sum_across_processes``'s ``process_allgather`` branch merges disjoint
    strides correctly on BOTH ranks (first real execution of
    utils/dist_util.py:77-79),
  * a jitted global-mesh train step assembled from per-process local batch
    halves produces the SAME loss trajectory as this (single-process)
    test's own 8-device run, and
  * folder-strided video ``dist_validation`` with the real cross-process
    metric merge equals single-process ``nondist_validation``.
"""

import json
import os
import socket
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
WORKER = os.path.join(REPO, 'tests', 'dist_2proc_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope='module')
def video_root(tmp_path_factory):
    """3 folders x 2 frames of x4 pairs (40px LR keeps SpyNet's pyramid
    non-degenerate); 3 folders over 2 ranks exercises the anti-deadlock
    padding replay."""
    root = tmp_path_factory.mktemp('vid2proc')
    rng = np.random.RandomState(0)
    for clip in ['000', '001', '002']:
        (root / 'gt' / clip).mkdir(parents=True)
        (root / 'lq' / clip).mkdir(parents=True)
        for i in range(2):
            gt = (rng.rand(160, 160, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(root / 'gt' / clip / f'{i:08d}.png'), gt)
            cv2.imwrite(str(root / 'lq' / clip / f'{i:08d}.png'),
                        cv2.resize(gt, (40, 40)))
    return root


@pytest.fixture(scope='module')
def worker_results(video_root, tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp('out2proc'))
    port = _free_port()
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(r), str(port), outdir, str(video_root)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out.decode(errors='replace'))
    for r, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f'rank {r} failed:\n{log[-4000:]}'
    results = []
    for r in range(2):
        with open(os.path.join(outdir, f'rank{r}.json')) as f:
            results.append(json.load(f))
    return results


def test_process_topology(worker_results):
    assert worker_results[0]['rank_world'] == [0, 2]
    assert worker_results[1]['rank_world'] == [1, 2]


def test_sum_across_processes_real_allgather(worker_results):
    """Both ranks see the full merged vector — the process_allgather branch
    executed for real (identity-tested only, until now)."""
    want = [1., 2., 3., 4., 5., 6.]
    assert worker_results[0]['sum'] == want
    assert worker_results[1]['sum'] == want


def test_global_mesh_train_step_matches_single_process(worker_results):
    """Two processes each feeding their local half must reproduce this
    process's own single-process 8-device run (identical seeded init; L1
    mean is permutation-invariant over the batch)."""
    from basicsr4rs_tpu.models import build_model
    from basicsr4rs_tpu.utils.options import yaml_load
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    from dist_2proc_worker import SR_OPT

    model = build_model(yaml_load(SR_OPT))
    rngb = np.random.RandomState(0)
    batch = {'lq': rngb.rand(8, 8, 8, 3).astype(np.float32),
             'gt': rngb.rand(8, 32, 32, 3).astype(np.float32)}
    model.feed_data(batch)
    model.optimize_parameters(1)
    l1 = float(model.get_current_log()['l_pix'])
    model.feed_data(batch)
    model.optimize_parameters(2)
    l2 = float(model.get_current_log()['l_pix'])

    for r in range(2):
        assert worker_results[r]['l_pix'] == pytest.approx(l1, abs=1e-5), f'rank {r} step1'
        assert worker_results[r]['l_pix2'] == pytest.approx(l2, abs=1e-5), f'rank {r} step2'
    # the two steps must differ (the optimizer actually stepped)
    assert abs(l1 - l2) > 1e-7


def test_cross_process_checkpoint_roundtrip(worker_results):
    """Rank-0 ``save`` mid-run + both-rank ``resume_training`` from the
    shared filesystem reproduces the uninterrupted loss trajectory
    bit-for-bit, and the saved network checkpoint equals the live params
    (VERDICT r3 #5; reference base_model.py:321-374)."""
    for r in range(2):
        res = worker_results[r]
        assert res['resumed_step'] == 2, f'rank {r} resumed step'
        assert res['net_ckpt_bitexact'], f'rank {r} network checkpoint'
        assert res['l_pix3_resumed'] == res['l_pix3_uninterrupted'], f'rank {r} step3'
        assert res['l_pix4_resumed'] == res['l_pix4_uninterrupted'], f'rank {r} step4'
    # the trajectory is actually progressing (not a frozen state)
    assert (worker_results[0]['l_pix3_uninterrupted']
            != worker_results[0]['l_pix4_uninterrupted'])


def test_dist_validation_matches_single_process(worker_results, video_root):
    """Folder-strided validation merged across REAL processes == this
    process's single nondist_validation."""
    from basicsr4rs_tpu.data import build_dataset
    from basicsr4rs_tpu.models import build_model
    from basicsr4rs_tpu.models.video_base_model import VideoBaseModel
    from basicsr4rs_tpu.utils.options import yaml_load
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    from dist_2proc_worker import VID_OPT

    ds = build_dataset({'name': 'VidRec', 'type': 'VideoRecurrentTestDataset',
                        'phase': 'val', 'scale': 4,
                        'dataroot_gt': str(video_root / 'gt'),
                        'dataroot_lq': str(video_root / 'lq'),
                        'io_backend': {'type': 'disk'}, 'num_frame': -1,
                        'cache_data': True})

    class _Loader:
        def __init__(self, dataset):
            self.dataset = dataset

        def __iter__(self):
            for i in range(len(self.dataset)):
                yield VideoBaseModel._collate_single(self.dataset[i])

    model = build_model(yaml_load(VID_OPT))
    model.nondist_validation(_Loader(ds), current_iter=1, tb_logger=None,
                             save_img=False)
    single = {k: np.asarray(v) for k, v in model.metric_results_per_folder.items()}

    # in the real run both ranks hold the SAME merged arrays (allgather-sum)
    for r in range(2):
        got = {k: np.asarray(v) for k, v in worker_results[r]['val'].items()}
        assert set(got) == set(single)
        for f in single:
            np.testing.assert_allclose(got[f], single[f], rtol=1e-4, atol=1e-4,
                                       err_msg=f'rank {r} folder {f}')
        # striding actually happened: merged values are nonzero everywhere
        assert all((np.asarray(v) > 0).all() for v in got.values())
