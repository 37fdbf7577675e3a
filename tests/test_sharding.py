"""Multi-chip sharding on the virtual 8-device CPU mesh: data-parallel
numerics match single-device, tensor-parallel compiles and runs."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                      param_shardings, replicated,
                                      shard_pytree)
from odevit_tpu.train.state import (all_trainable, create_train_state,
                                    make_optimizer)
from odevit_tpu.train.steps import make_free_train_step


def setup(num_heads=4):
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=num_heads,
               mlp_ratio=2.0, num_classes=5, emulate_depth=4,
               time_interval=1.0, num_eval_steps=5, solver="euler",
               register_tokens=2)
    rng = np.random.default_rng(0)
    batch = {"pixel_values": jnp.asarray(
                 rng.standard_normal((16, 16, 16, 3)).astype(np.float32)),
             "labels": jnp.asarray(rng.integers(0, 5, 16))}
    v = m.init(jax.random.PRNGKey(0), batch["pixel_values"])
    return m, v["params"], batch


def run_steps(m, params, batch, mesh=None, tp=False, n=3):
    tx = make_optimizer(1e-3, weight_decay=5e-2, clip_norm=1.0,
                        trainable_mask=all_trainable(params))
    if mesh is not None:
        pshard = param_shardings(params, mesh, tensor_parallel=tp)
        params = shard_pytree(params, pshard)
        batch = jax.device_put(batch, batch_sharding(mesh))
    state = create_train_state(params, tx)
    step = make_free_train_step(m, tx, jasmin_k=2, donate=False)
    losses = []
    for _ in range(n):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    return losses, jax.tree_util.tree_map(np.asarray, state.params)


def test_dp_matches_single_device():
    m, params, batch = setup()
    ref_losses, ref_params = run_steps(m, params, batch)
    mesh = make_mesh(num_data=8, num_model=1)
    dp_losses, dp_params = run_steps(m, params, batch, mesh=mesh)
    np.testing.assert_allclose(dp_losses, ref_losses, rtol=2e-5)
    flat_r = jax.tree_util.tree_leaves(ref_params)
    flat_d = jax.tree_util.tree_leaves(dp_params)
    for r, d in zip(flat_r, flat_d):
        np.testing.assert_allclose(d, r, atol=1e-5, rtol=1e-4)


def test_tp_mesh_compiles_and_matches():
    m, params, batch = setup(num_heads=4)
    ref_losses, _ = run_steps(m, params, batch)
    mesh = make_mesh(num_data=2, num_model=4)
    tp_losses, _ = run_steps(m, params, batch, mesh=mesh, tp=True)
    np.testing.assert_allclose(tp_losses, ref_losses, rtol=5e-4)


def test_param_shardings_specs():
    m, params, _ = setup()
    mesh = make_mesh(num_data=2, num_model=4)
    shardings = param_shardings(params, mesh, tensor_parallel=True)
    assert shardings["vf"]["attn"]["qkv_kernel"].spec == P(None, "model")
    assert shardings["vf"]["mlp"]["fc2_kernel"].spec == P("model", None)
    assert shardings["patch_embed"]["pos_embed"].spec == P()


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_multihost_helpers_single_process():
    from odevit_tpu.parallel.multihost import (initialize_distributed,
                                               make_multislice_mesh,
                                               process_local_batch_slice)
    initialize_distributed()          # no-op single process
    mesh = make_multislice_mesh(num_model=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.shape["dcn"] == 1 and mesh.shape["model"] == 2
    assert mesh.shape["data"] == 4
    s = process_local_batch_slice(64)
    assert (s.stop - s.start) == 64


def test_fused_train_step_dp_matches_single_device():
    """The shard_map DP wrapper of the fused training step (Pallas
    kernels on local shards + pmean over 'data') must reproduce the
    single-device fused step: same loss, same updated params."""
    from odevit_tpu.train.fast_steps import make_fast_free_train_step
    from odevit_tpu.train.state import (all_trainable, create_train_state,
                                        make_optimizer)
    from odevit_tpu.utils.init_utils import init_on_cpu
    from odevit_tpu.parallel.mesh import batch_sharding, replicated
    import jax.flatten_util as fu
    from odevit_tpu.models.vit_ode import ViTODE

    rng = np.random.default_rng(0)
    batch = {"pixel_values": jnp.asarray(
                 rng.standard_normal((8, 16, 16, 3)), jnp.float32),
             "labels": jnp.asarray(rng.integers(0, 10, 8))}
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, num_classes=10, emulate_depth=12.0,
               time_interval=1.0, num_eval_steps=5, solver="rk4",
               register_tokens=2, pos_embed_register_tokens=False,
               remat=False)
    p = init_on_cpu(m, jax.random.PRNGKey(0),
                    batch["pixel_values"][:2])["params"]
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(p))

    s1, _ = make_fast_free_train_step(m, tx, jasmin_k=3, donate=False)(
        create_train_state(p, tx), batch, jax.random.PRNGKey(1))

    mesh = make_mesh(num_data=4, num_model=2)
    s2, m2 = make_fast_free_train_step(
        m, tx, jasmin_k=3, donate=False, mesh=mesh)(
            create_train_state(jax.device_put(p, replicated(mesh)), tx),
            jax.device_put(batch, batch_sharding(mesh)),
            jax.random.PRNGKey(1))
    f1, _ = fu.ravel_pytree(jax.device_get(s1.params))
    f2, _ = fu.ravel_pytree(jax.device_get(s2.params))
    rel = np.linalg.norm(f1 - f2) / (np.linalg.norm(f1) + 1e-12)
    assert rel < 1e-4, rel
    assert np.isfinite(float(m2["loss"]))


def _params_rel(s1, s2):
    import jax.flatten_util as fu
    f1, _ = fu.ravel_pytree(jax.device_get(s1.params))
    f2, _ = fu.ravel_pytree(jax.device_get(s2.params))
    return np.linalg.norm(f1 - f2) / (np.linalg.norm(f1) + 1e-12)


def test_fused_distill_step_dp_matches_single_device():
    """The fused distillation step's shard_map DP wrapper (teacher +
    student + trajectory/attention losses on local shards, pmean'd
    grads) must reproduce the single-device fused step."""
    from odevit_tpu.teacher.vit import ViTTeacher
    from odevit_tpu.train.fast_steps import make_fast_distill_train_step
    from odevit_tpu.utils.init_utils import init_on_cpu

    rng = np.random.default_rng(3)
    batch = {"pixel_values": jnp.asarray(
                 rng.standard_normal((8, 16, 16, 3)), jnp.float32),
             "labels": jnp.asarray(rng.integers(0, 7, 8))}
    m = ViTODE(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
               mlp_ratio=2.0, num_classes=7, emulate_depth=12.0,
               time_interval=1.0, num_eval_steps=7, solver="euler",
               register_tokens=2, remat=False)
    teacher = ViTTeacher(image_size=16, patch_size=4, hidden_size=32,
                         num_layers=12, num_heads=2, mlp_dim=64,
                         num_classes=7)
    p = m.init(jax.random.PRNGKey(0), batch["pixel_values"])["params"]
    tp = teacher.init(jax.random.PRNGKey(1),
                      batch["pixel_values"])["params"]
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(p))
    kw = dict(lambda_param=0.5, jasmin_k=2, mse_full_path=True,
              use_distillation=True, donate=False)

    s1, m1 = make_fast_distill_train_step(m, teacher, tx, **kw)(
        create_train_state(p, tx), tp, batch, jax.random.PRNGKey(2),
        supervise=True)

    mesh = make_mesh(num_data=8, num_model=1)
    s2, m2 = make_fast_distill_train_step(m, teacher, tx, mesh=mesh,
                                          **kw)(
        create_train_state(jax.device_put(p, replicated(mesh)), tx),
        jax.device_put(tp, replicated(mesh)),
        jax.device_put(batch, batch_sharding(mesh)),
        jax.random.PRNGKey(2), supervise=True)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=2e-5)
    assert _params_rel(s1, s2) < 1e-4


def test_fused_macaron_step_dp_matches_single_device():
    from odevit_tpu.models.macaron import ViTMacaron
    from odevit_tpu.train.fast_steps import make_fast_macaron_train_step

    rng = np.random.default_rng(4)
    batch = {"pixel_values": jnp.asarray(
                 rng.standard_normal((8, 16, 16, 3)), jnp.float32),
             "labels": jnp.asarray(rng.integers(0, 7, 8))}
    m = ViTMacaron(img_size=16, patch_size=4, embed_dim=32, num_heads=2,
                   mlp_ratio=2.0, num_classes=7, emulate_depth=4,
                   time_interval=4.0, num_eval_steps=5, solver="rk4",
                   learn_ivp=True, remat=False)
    p = m.init(jax.random.PRNGKey(0), batch["pixel_values"])["params"]
    tx = make_optimizer(1e-3, trainable_mask=all_trainable(p))

    s1, m1 = make_fast_macaron_train_step(m, tx, donate=False)(
        create_train_state(p, tx), batch, jax.random.PRNGKey(1))

    mesh = make_mesh(num_data=8, num_model=1)
    s2, m2 = make_fast_macaron_train_step(m, tx, donate=False,
                                          mesh=mesh)(
        create_train_state(jax.device_put(p, replicated(mesh)), tx),
        jax.device_put(batch, batch_sharding(mesh)),
        jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=2e-5)
    assert _params_rel(s1, s2) < 1e-4
