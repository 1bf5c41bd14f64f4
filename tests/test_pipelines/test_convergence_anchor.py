"""Mid-scale convergence anchor as a gated test (VERDICT r5 #4): the same
recipe on the same corpus from the same init must converge to the same val
PSNR in this framework and the torch reference. The full-scale run
(3000 iters, feat 16 — delta +0.04 dB) lives in scripts/convergence_anchor.py
and docs/Performance.md; this slow-tier test runs a reduced version so the
torch side is exercised in CI.

The script runs in a SUBPROCESS: torch training for hundreds of iterations
followed by XLA-CPU compilation in one process aborts in this environment
(OMP/pthread pool conflict — interleaved per-step usage as in
test_train_parity.py is fine, bulk phases are not), and the subprocess is
also exactly how the anchor is meant to be reproduced.
"""

import json
import os
import subprocess
import sys
from os import path as osp

import pytest

_SCRIPT = osp.abspath(osp.join(osp.dirname(osp.abspath(__file__)), '..', '..',
                               'scripts', 'convergence_anchor.py'))


@pytest.mark.slow
def test_convergence_anchor_small():
    """800 iters of a tiny MSRResNet, torch-CPU vs JAX-CPU — identical init,
    batches and recipe — must land within 0.25 dB with both sides' losses
    measurably decreased."""
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)   # keep the subprocess off the TPU
    env['JAX_PLATFORMS'] = 'cpu'
    # single-device: the conftest's 8-virtual-device flag would make the
    # subprocess train 8-way data-parallel on an already-loaded CPU — its
    # 40 s collective-rendezvous watchdog then kills the run
    import re
    env['XLA_FLAGS'] = re.sub(r'--xla_force_host_platform_device_count=\d+',
                              '', env.get('XLA_FLAGS', '')).strip()
    r = subprocess.run(
        [sys.executable, _SCRIPT, '--iters', '800', '--feat', '8',
         '--blocks', '2', '--batch', '8', '--lr', '1e-3', '--tol-db', '0.25'],
        capture_output=True, text=True, env=env,
        cwd=osp.dirname(osp.dirname(_SCRIPT)), timeout=900)
    assert r.returncode == 0, f'anchor script failed:\n{r.stderr[-2000:]}'
    out = json.loads(r.stdout.strip().splitlines()[-1])

    # identical starting point: first losses match to float tolerance
    assert abs(out['jax_loss_first'] - out['torch_loss_first']) <= \
        1e-4 * out['torch_loss_first'], out
    # both sides actually trained (L1 at this scale moves ~10% in 800 iters;
    # the convergence claim itself is the delta_db assertion below)
    assert out['torch_loss_last'] < out['torch_loss_first'] * 0.93, out
    assert out['jax_loss_last'] < out['jax_loss_first'] * 0.93, out
    # converged to the same quality
    assert out['converged_equal'], (
        f"convergence drift: jax {out['psnr_jax']} dB vs torch "
        f"{out['psnr_torch']} dB (delta {out['delta_db']} dB)")
