"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-device sharding paths are exercised without TPU hardware
(SURVEY.md §4 implication; the reference has no distributed tests at all).

Note: the environment's sitecustomize registers the remote 'axon' TPU
backend and overrides JAX_PLATFORMS, so env vars alone don't stick — we must
update jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# fast/slow split (VERDICT r3 #7). The default run (`pytest`) deselects the
# tests below and finishes in ~20 min on 8 virtual CPU devices; the slow
# tier (scan-heavy video parity, multi-process spawns, mesh-exactness at
# full depth) runs with `pytest -m slow`, the whole suite with
# `pytest -m 'slow or not slow'`. See tests/README.md. Node IDs are listed
# explicitly (measured >= 20 s in the round-4 timing run) so each module
# keeps its fast members in the default tier.
# ---------------------------------------------------------------------------
_SLOW_FILES = {
    # every test here shares a ~3 min 2-process spawn fixture
    'test_models/test_two_process_distributed.py',
}
_SLOW_IDS = {
    'test_parallel_mesh.py::test_basicvsrpp_mesh_exactness',
    'test_parallel_mesh.py::test_stylegan2_mesh_exactness',
    'test_parallel_mesh.py::test_basicvsr_mesh_exactness',
    'test_parallel_mesh.py::test_basicvsr_spatial_mesh_exactness',
    'test_parallel_mesh.py::test_diffusion_unet_mesh_exactness',
    'test_parallel_mesh.py::test_edvr_mesh_exactness',
    'test_parallel_mesh.py::test_swinir_mesh_exactness[8-1]',
    'test_parallel_mesh.py::test_swinir_mesh_exactness[4-2]',
    'test_parallel_mesh_families.py::test_basicvsr_mesh_exactness',
    'test_parallel_mesh_families.py::test_swinir_mesh_exactness_fused_kernels[8-1]',
    'test_parallel_mesh_families.py::test_edvr_mesh_exactness_dcn_pallas',
    'test_parallel_mesh_families.py::test_swinir_mesh_grads_fused_kernels',
    'test_archs/test_dfdnet_parity.py::test_dfdnet_parity',
    'test_archs/test_video_parity.py::test_iconvsr_scan_golden',
    'test_archs/test_video_parity.py::test_iconvsr_shape_contract',
    'test_archs/test_video_parity.py::test_basicvsrpp_shape_contract',
    'test_archs/test_video_parity.py::test_iconvsr_torch_key_conversion',
    'test_archs/test_video_parity.py::test_edvr_shape_contract',
    'test_archs/test_video_parity.py::test_basicvsr_parity',
    'test_archs/test_video_parity.py::test_spynet_parity',
    'test_pipelines/test_train_parity.py::test_video_recurrent_fix_flow_trajectory_matches_torch',
    'test_pipelines/test_train_parity.py::test_srgan_gd_cycle_matches_torch',
    'test_models/test_video_models.py::test_basicvsrpp_under_video_recurrent_model_builds',
    'test_models/test_video_models.py::test_video_recurrent_model_train',
    'test_models/test_video_models.py::test_edvr_dcn_offset_diagnostic',
    'test_models/test_video_models.py::test_edvr_model_tsa_warmup',
    'test_models/test_gan_models.py::test_hifacegan_model',
    'test_models/test_gan_models.py::test_gan_vgg_discriminator_batchnorm',
    'test_models/test_stylegan2_model.py::test_stylegan2_train_and_reg',
    'test_models/test_diffusion.py::test_resshift_model_train_and_sample',
    'test_models/test_diffusion.py::test_align_frozen_diff_model',
    'test_models/test_diffusion.py::test_unet_model_swin_forward',
    'test_models/test_diffusion.py::test_align_joint_diff_model',
    'test_models/test_advice_fixes.py::test_batch_stats_saved_and_resumed',
    'test_models/test_advice_fixes.py::test_ldl_loss_wired_into_g_objective',
    'test_models/test_video_dist_validation.py::test_recurrent_folder_strided_validation_matches_single',
    'test_models/test_video_dist_validation.py::test_base_frame_strided_validation_matches_single',
    'test_models/test_realesrgan.py::test_realesrgan_gan_model_train_step',
    'test_metrics/test_fid_lpips.py::test_inception_block_shapes',
    'test_ops/test_quant.py::test_calibration_skips_scanned_convs',
    'test_ops/test_quant.py::test_arch_level_accuracy[arch_opt1-lr_shape1]',
    'test_ops/test_dcn.py::test_pallas_sampler_matches_gather[1]',
    'test_ops/test_dcn.py::test_pallas_sampler_matches_gather[2]',
    'test_ops/test_dcn.py::test_onehot_sampler_matches_gather[1]',
    'test_ops/test_conv3x3.py::test_arch_param_tree_identical_both_paths',
    'test_ops/test_tile.py::test_tiled_apply_swinir_receptive_field',
    'test_ops/test_swin_block.py::test_vjp_matches_reference_grads[1]',
}


def pytest_collection_modifyitems(config, items):
    import os.path as osp
    root = osp.dirname(osp.abspath(__file__))
    matched = set()
    collected_files = set()
    for item in items:
        rel = osp.relpath(str(item.fspath), root).replace('\\', '/')
        collected_files.add(rel)
        nodeid = f'{rel}::{item.name}'
        if nodeid in _SLOW_IDS or rel in _SLOW_FILES:
            matched.add(nodeid if nodeid in _SLOW_IDS else rel)
            item.add_marker(pytest.mark.slow)
    # Tier-list hygiene (VERDICT r4 weak #5): a renamed/removed test must
    # not silently fall out of the slow tier. Only ids whose FILE was
    # collected can be judged stale — running a subset of the suite must
    # not trip this — and explicit node-id / -k selection (which collects
    # only the chosen tests from a file) skips the check entirely.
    narrowed = (any('::' in str(a) for a in config.invocation_params.args)
                or bool(config.getoption('keyword', '')))
    stale = {nid for nid in _SLOW_IDS
             if nid.split('::')[0] in collected_files and nid not in matched}
    if stale and not narrowed:
        raise pytest.UsageError(
            'tests/conftest.py _SLOW_IDS entries match no collected test '
            '(renamed or removed?): ' + ', '.join(sorted(stale)))


# ---------------------------------------------------------------------------
# Fast-tier duration guard (VERDICT r4 weak #5): the 20-minute default-tier
# budget is enforced, not hoped. Any test running in the fast tier (i.e. not
# marked slow — new tests land there by default) that exceeds
# FAST_TIER_MAX_S wall seconds fails the run with instructions to either
# mark it `@pytest.mark.slow` or add its node id to _SLOW_IDS.
# ---------------------------------------------------------------------------
_FAST_TIER_MAX_S = float(os.environ.get('FAST_TIER_MAX_S', '60'))
_overbudget = []


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    import time
    t0 = time.monotonic()
    yield
    dt = time.monotonic() - t0
    if dt > _FAST_TIER_MAX_S and item.get_closest_marker('slow') is None:
        _overbudget.append((item.nodeid, dt))


def pytest_sessionfinish(session, exitstatus):
    if _overbudget:
        lines = '\n'.join(f'  {nid}: {dt:.1f}s' for nid, dt in _overbudget)
        print(f'\nERROR: fast-tier tests exceeded FAST_TIER_MAX_S='
              f'{_FAST_TIER_MAX_S:.0f}s — mark them @pytest.mark.slow or add '
              f'them to tests/conftest.py _SLOW_IDS:\n{lines}')
        session.exitstatus = 1
