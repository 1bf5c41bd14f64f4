"""The benchmark's lax.scan-chained train step must be SEMANTICALLY
identical to the sequential ``optimize_parameters`` loop (r5: benches chain
K steps inside one executable to amortize remote-dispatch cost — the chain
must not change training)."""

import jax
import jax.numpy as jnp
import numpy as np

from basicsr4rs_tpu.models import build_model
from basicsr4rs_tpu.utils.options import yaml_load


def _model():
    opt = yaml_load("""
name: chain_pin
model_type: SRModel
scale: 4
num_gpu: 1
manual_seed: 0
is_train: true
dist: false
rank: 0
world_size: 1
network_g: {type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 8, num_block: 2, upscale: 4}
path: {pretrain_network_g: ~}
train:
  ema_decay: 0.99
  optim_g: {type: Adam, lr: !!float 1e-3, betas: [0.9, 0.99]}
  scheduler: {type: ConstantLR}
  total_iter: 100
  pixel_opt: {type: L1Loss, loss_weight: 1.0, reduction: mean}
val: {val_freq: 1000}
""")
    return build_model(opt)


def test_scan_chain_matches_sequential_steps():
    rng = np.random.RandomState(0)
    batch = {'lq': rng.rand(2, 8, 8, 3).astype(np.float32),
             'gt': rng.rand(2, 32, 32, 3).astype(np.float32)}

    m1 = _model()
    m1.feed_data(batch)
    for i in range(4):
        m1.optimize_parameters(i + 1)
    seq_params = m1.state.params
    seq_ema = m1.state.ema_params

    m2 = _model()
    m2.feed_data(batch)
    step_fn = m2._train_step_fn

    @jax.jit
    def chain(state, b):
        def body(s, _):
            s2, losses = step_fn(s, b)
            return s2, losses['l_pix']
        return jax.lax.scan(body, state, None, length=4)

    chained_state, losses = chain(m2.state, m2.batch)

    assert int(chained_state.step) == int(m1.state.step) == 4
    flat_a = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(seq_params)}
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(chained_state.params)}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]),
                                   np.asarray(flat_b[k]),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f'param drift at {k}')
    for a, b in zip(jax.tree_util.tree_leaves(seq_ema),
                    jax.tree_util.tree_leaves(chained_state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # losses decrease over the chain (it is really training)
    ls = np.asarray(losses)
    assert ls[-1] < ls[0]
