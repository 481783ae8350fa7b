"""Model-layer tests: shapes, masking, and SE(3) equivariance of HEPi/EMPN.

The equivariance test generalizes the reference's inspection demo
(ponita.py:372-449): rotating node positions, vector features AND the
orientation grid must rotate HEPi's vector output exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometry_rl_tpu.graphs import EdgeSet, GraphFeatures, HeteroGraph, NodeSet
from geometry_rl_tpu.models import (
    GCN,
    DeepSets,
    DiagGaussianPolicy,
    GraphValueNet,
    HEPi,
    MLPValueNet,
    PonitaGCN,
    TransformerVanilla,
    get_model,
)
from geometry_rl_tpu.utils import math as gm

B, N_OBJ, N_GRIP = 3, 8, 1


def make_toy_graph(rng, num_grippers=N_GRIP, with_mask=True):
    """Rigid-task-like graph: object_geometry + grippers, 3 edge levels."""
    obj_pos = rng.normal(size=(B, N_OBJ, 3)).astype(np.float32)
    grip_pos = rng.normal(size=(B, num_grippers, 3)).astype(np.float32)

    nodes = {
        "object_geometry": NodeSet(
            pos=jnp.asarray(obj_pos),
            norm_pos=jnp.asarray(obj_pos) * 0.5,
            mask=jnp.ones((B, N_OBJ)) if with_mask else None,
        ),
        "grippers": NodeSet(
            pos=jnp.asarray(grip_pos),
            norm_pos=jnp.asarray(grip_pos) * 0.5,
        ),
    }

    # internal: ring over object nodes; task: all obj -> gripper 0; agent: none/pairs
    src_int = np.tile(np.arange(N_OBJ), (B, 1))
    dst_int = np.tile((np.arange(N_OBJ) + 1) % N_OBJ, (B, 1))
    src_task = np.tile(np.arange(N_OBJ), (B, 1))
    dst_task = np.zeros((B, N_OBJ), np.int64)

    edges = {
        ("object_geometry", "internal", "object_geometry"): EdgeSet(
            src=jnp.asarray(src_int, jnp.int32),
            dst=jnp.asarray(dst_int, jnp.int32),
            mask=jnp.ones((B, N_OBJ)),
        ),
        ("object_geometry", "task", "grippers"): EdgeSet(
            src=jnp.asarray(src_task, jnp.int32),
            dst=jnp.asarray(dst_task, jnp.int32),
            mask=jnp.ones((B, N_OBJ)),
        ),
    }
    if num_grippers > 1:
        pairs = [(i, j) for i in range(num_grippers) for j in range(num_grippers) if i != j]
        src_a = np.tile(np.array([p[0] for p in pairs]), (B, 1))
        dst_a = np.tile(np.array([p[1] for p in pairs]), (B, 1))
        edges[("grippers", "agent", "grippers")] = EdgeSet(
            src=jnp.asarray(src_a, jnp.int32),
            dst=jnp.asarray(dst_a, jnp.int32),
            mask=jnp.ones((B, len(pairs))),
        )

    graph = HeteroGraph(nodes=nodes, edges=edges, output_node_type="grippers")

    feats = GraphFeatures(
        scalars={
            "object_geometry": jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (B, N_OBJ, 1)),
            "grippers": jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (B, num_grippers, 1)),
        },
        vectors={
            "object_geometry": jnp.asarray(rng.normal(size=(B, N_OBJ, 4, 3)).astype(np.float32)),
            "grippers": jnp.asarray(rng.normal(size=(B, num_grippers, 4, 3)).astype(np.float32)),
        },
    )
    return graph, feats


def rotate_graph(graph, feats, R):
    R = jnp.asarray(R)
    nodes = {
        nt: ns._replace(pos=ns.pos @ R.T, norm_pos=ns.norm_pos @ R.T) for nt, ns in graph.nodes.items()
    }
    feats_r = GraphFeatures(
        scalars=feats.scalars,
        vectors={nt: v @ R.T for nt, v in feats.vectors.items()},
    )
    return graph._replace(nodes=nodes), feats_r


@pytest.fixture
def toy():
    return make_toy_graph(np.random.default_rng(0))


def test_hepi_shapes(toy):
    graph, feats = toy
    model = HEPi(latent_dim=32, hidden_dim=32, output_dim=2, output_dim_vec=2, num_ori=8)
    params = model.init(jax.random.PRNGKey(0), graph, feats)
    out, latent = model.apply(params, graph, feats)
    assert out.shape == (B, N_GRIP, 2, 3)
    assert latent.shape == (B, N_GRIP, 32)


def test_hepi_equivariance():
    """Joint rotation of positions, vector features, and the grid rotates the
    vector output exactly (and leaves the invariant latent unchanged)."""
    rng = np.random.default_rng(1)
    graph, feats = make_toy_graph(rng)
    model = HEPi(latent_dim=32, hidden_dim=32, output_dim=2, output_dim_vec=2, num_ori=12, only_upper_hemisphere=False)
    grid = gm.fibonacci_lattice(12)
    params = model.init(jax.random.PRNGKey(0), graph, feats, ori_grid=grid)

    # random rotation
    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    R = np.asarray(gm.quat_to_matrix(jnp.asarray(q)))

    out, latent = model.apply(params, graph, feats, ori_grid=grid)
    graph_r, feats_r = rotate_graph(graph, feats, R)
    out_r, latent_r = model.apply(params, graph_r, feats_r, ori_grid=jnp.asarray(grid @ R.T))

    np.testing.assert_allclose(out_r, out @ R.T, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(latent_r, latent, atol=1e-4, rtol=1e-3)


def test_hepi_translation_invariance(toy):
    """Translating all positions leaves outputs unchanged (relative-position
    invariants only)."""
    graph, feats = toy
    model = HEPi(latent_dim=32, hidden_dim=32, output_dim=2, output_dim_vec=2, num_ori=8)
    params = model.init(jax.random.PRNGKey(0), graph, feats)
    out, _ = model.apply(params, graph, feats)

    t = jnp.asarray([1.0, -2.0, 3.0])
    nodes = {nt: ns._replace(pos=ns.pos + t) for nt, ns in graph.nodes.items()}
    out_t, _ = model.apply(params, graph._replace(nodes=nodes), feats)
    np.testing.assert_allclose(out_t, out, atol=1e-5)


def test_hepi_edge_mask_blocks_messages(toy):
    """Zero-mask edges must not influence the output."""
    graph, feats = toy
    model = HEPi(latent_dim=16, hidden_dim=16, output_dim=1, output_dim_vec=1, num_ori=4)
    params = model.init(jax.random.PRNGKey(0), graph, feats)

    # corrupt a source node's features but mask out its (task) edges
    ek = ("object_geometry", "task", "grippers")
    es = graph.edges[ek]
    mask = np.ones((B, es.num_edges), np.float32)
    mask[:, 3] = 0.0
    graph_m = graph._replace(edges={**graph.edges, ek: es._replace(mask=jnp.asarray(mask))})
    # also mask node 3's outgoing internal edge so it has NO path to the gripper
    eki = ("object_geometry", "internal", "object_geometry")
    esi = graph.edges[eki]
    maski = np.ones((B, esi.num_edges), np.float32)
    maski[:, 3] = 0.0
    graph_m = graph_m._replace(edges={**graph_m.edges, eki: esi._replace(mask=jnp.asarray(maski))})
    out1, _ = model.apply(params, graph_m, feats)

    v = np.asarray(feats.vectors["object_geometry"]).copy()
    v[:, 3] += 100.0  # corrupt the fully-masked node's features
    feats2 = GraphFeatures(
        scalars=feats.scalars,
        vectors={**feats.vectors, "object_geometry": jnp.asarray(v)},
    )
    out2, _ = model.apply(params, graph_m, feats2)
    # gripper output must be unaffected by the fully-masked node
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_ponita_gcn_shapes(toy):
    graph, feats = toy
    model = PonitaGCN(hidden_dim=32, output_dim=2, output_dim_vec=2, num_ori=8, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), graph, feats)
    out, latent = model.apply(params, graph, feats)
    assert out.shape == (B, N_GRIP, 2, 3)
    assert latent.shape == (B, N_GRIP, 32)


def test_transformer_shapes(toy):
    graph, feats = toy
    model = TransformerVanilla(hidden_dim=32, output_dim=6, num_layers=2, num_heads=2)
    params = model.init(jax.random.PRNGKey(0), graph, feats)
    out, latent = model.apply(params, graph, feats)
    assert out.shape == (B, N_GRIP, 6)
    assert latent.shape == (B, N_GRIP, 32)


def test_transformer_concat_global(toy):
    graph, feats = toy
    model = TransformerVanilla(hidden_dim=32, output_dim=6, num_layers=1, num_heads=2, concat_global=True)
    params = model.init(jax.random.PRNGKey(0), graph, feats)
    out, latent = model.apply(params, graph, feats)
    assert out.shape == (B, N_GRIP, 6)


def test_gcn_shapes(toy):
    graph, feats = toy
    model = GCN(hidden_dim=32, output_dim=6)
    params = model.init(jax.random.PRNGKey(0), graph, feats)
    out, latent = model.apply(params, graph, feats)
    assert out.shape == (B, N_GRIP, 6)


def test_deepsets_and_value_net(toy):
    graph, feats = toy
    critic = GraphValueNet(backbone=DeepSets(hidden_dim=32, output_dim=32))
    params = critic.init(jax.random.PRNGKey(0), graph, feats)
    v = critic.apply(params, graph, feats)
    assert v.shape == (B,)


def test_deepsets_mask_invariance(toy):
    """Padded (masked) nodes must not change the DeepSets pooling."""
    graph, feats = toy
    mask = np.ones((B, N_OBJ), np.float32)
    mask[:, -2:] = 0.0
    nodes = dict(graph.nodes)
    nodes["object_geometry"] = nodes["object_geometry"]._replace(mask=jnp.asarray(mask))
    graph_m = graph._replace(nodes=nodes)

    model = DeepSets(hidden_dim=16, output_dim=8)
    params = model.init(jax.random.PRNGKey(0), graph_m, feats)
    out1 = model.apply(params, graph_m, feats)

    v = np.asarray(feats.vectors["object_geometry"]).copy()
    v[:, -2:] += 50.0
    feats2 = GraphFeatures(scalars=feats.scalars, vectors={**feats.vectors, "object_geometry": jnp.asarray(v)})
    out2 = model.apply(params, graph_m, feats2)
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_policy_hepi_post_fc_false(toy):
    graph, feats = toy
    policy = DiagGaussianPolicy(
        backbone=HEPi(latent_dim=32, hidden_dim=32, output_dim=2, output_dim_vec=2, num_ori=8),
        action_dim=6,
        num_actuators=1,
        post_fc=False,
        contextual_std=True,
    )
    params = policy.init(jax.random.PRNGKey(0), graph, feats)
    dist = policy.apply(params, graph, feats)
    assert dist.mean.shape == (B, 6)
    assert dist.std.shape == (B, 6)
    assert (np.asarray(dist.std) > 0).all()


def test_policy_init_std():
    """At init the std should be ~init_std (heads are near-zero)."""
    rng = np.random.default_rng(2)
    graph, feats = make_toy_graph(rng)
    policy = DiagGaussianPolicy(
        backbone=HEPi(latent_dim=16, hidden_dim=16, output_dim=2, output_dim_vec=2, num_ori=4),
        action_dim=6,
        post_fc=False,
        contextual_std=True,
        init_std=1.0,
    )
    params = policy.init(jax.random.PRNGKey(0), graph, feats)
    dist = policy.apply(params, graph, feats)
    np.testing.assert_allclose(np.asarray(dist.std), 1.0, atol=0.2)


def test_make_std_fn():
    """Std-head activation: max_std=None is the exact reference
    parametrization; max_std=<float> smoothly caps per-dim std (the
    two-agents TRPL stability fix, docs/diag_two_agents_spike.json)."""
    from geometry_rl_tpu.models.policy import make_std_fn

    f = make_std_fn(1.0, 1e-5, None)
    np.testing.assert_allclose(float(f(jnp.zeros(1))[0]), 1.0, atol=1e-6)
    g = make_std_fn(1.0, 1e-5, 2.0)
    # std(0) == init_std preserved exactly; range (minimal_std, max_std)
    np.testing.assert_allclose(float(g(jnp.zeros(1))[0]), 1.0, atol=1e-5)
    assert float(g(jnp.full((1,), 50.0))[0]) <= 2.0 + 1e-6
    assert float(g(jnp.full((1,), -50.0))[0]) >= 1e-5 - 1e-12
    # monotone, differentiable at 0
    assert float(jax.grad(lambda p: g(p[None])[0])(0.0)) > 0
    # invalid ordering rejected (init_std must sit strictly inside the cap)
    with pytest.raises(ValueError):
        make_std_fn(1.0, 1e-5, 1.0)


def test_policy_max_std_cap():
    """DiagGaussianPolicy(max_std=...) bounds every per-dim std."""
    rng = np.random.default_rng(5)
    graph, feats = make_toy_graph(rng)
    policy = DiagGaussianPolicy(
        backbone=HEPi(latent_dim=16, hidden_dim=16, output_dim=2, output_dim_vec=2, num_ori=4),
        action_dim=6,
        post_fc=False,
        contextual_std=True,
        init_std=1.0,
        max_std=2.0,
    )
    params = policy.init(jax.random.PRNGKey(0), graph, feats)
    dist = policy.apply(params, graph, feats)
    s = np.asarray(dist.std)
    assert (s > 0).all() and (s <= 2.0).all()
    np.testing.assert_allclose(s, 1.0, atol=0.2)  # near init_std at init


def test_policy_two_agents():
    rng = np.random.default_rng(3)
    graph, feats = make_toy_graph(rng, num_grippers=2)
    policy = DiagGaussianPolicy(
        backbone=HEPi(latent_dim=16, hidden_dim=16, output_dim=1, output_dim_vec=1, num_ori=4),
        action_dim=6,
        num_actuators=2,
        per_actuator_heads=True,
        post_fc=True,
    )
    params = policy.init(jax.random.PRNGKey(0), graph, feats)
    dist = policy.apply(params, graph, feats)
    assert dist.mean.shape == (B, 6)


def test_policy_gradients_flow(toy):
    graph, feats = toy
    policy = DiagGaussianPolicy(
        backbone=HEPi(latent_dim=16, hidden_dim=16, output_dim=2, output_dim_vec=2, num_ori=4),
        action_dim=6,
        post_fc=False,
    )
    params = policy.init(jax.random.PRNGKey(0), graph, feats)

    def loss(p):
        dist = policy.apply(p, graph, feats)
        return (dist.mean**2).sum() + (dist.std**2).sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some gradient reaches the backbone kernels
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_mlp_value_net():
    critic = MLPValueNet(hidden_dims=(32, 32))
    obs = jnp.ones((B, 10))
    params = critic.init(jax.random.PRNGKey(0), obs)
    v = critic.apply(params, obs)
    assert v.shape == (B,)


def test_model_registry():
    m = get_model("hepi", latent_dim=16)
    assert isinstance(m, HEPi)
    with pytest.raises(ValueError):
        get_model("nope")


def test_calibration_rescales_kernels(toy):
    """After calibration each conv stage preserves feature std (x1 std ~
    input std; x2 std ~ x1 std), matching ponita conv.py:151-157."""
    from geometry_rl_tpu.models import calibrate

    graph, feats = toy
    model = HEPi(latent_dim=32, hidden_dim=32, output_dim=2, output_dim_vec=2, num_ori=8)
    params = model.init(jax.random.PRNGKey(0), graph, feats)
    calibrated = calibrate(model, params, graph, feats)

    # kernels actually changed
    import jax as _jax

    p0 = _jax.tree_util.tree_leaves(params)
    p1 = _jax.tree_util.tree_leaves(calibrated)
    assert any(float(jnp.abs(a - b).max()) > 1e-6 for a, b in zip(p0, p1))

    # after calibration the sown stds are ~equal per conv
    _, cols = model.apply(calibrated, graph, feats, mutable=["calibration"])

    def check(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "std_in" in v:
                    std_in, std_1, std_2 = (float(v[s][-1]) for s in ("std_in", "std_1", "std_2"))
                    assert abs(std_1 / std_in - 1) < 0.05, (k, std_in, std_1)
                    assert abs(std_2 / std_1 - 1) < 0.05, (k, std_1, std_2)
                else:
                    check(v)

    check(cols["calibration"])


def test_calibration_noop_for_conv_free_model(toy):
    from geometry_rl_tpu.models import calibrate

    graph, feats = toy
    model = DeepSets(hidden_dim=16, output_dim=8)
    params = model.init(jax.random.PRNGKey(0), graph, feats)
    out = calibrate(model, params, graph, feats)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_meshgraphnet(toy):
    from geometry_rl_tpu.models import MeshGraphNet

    graph, feats = toy
    model = MeshGraphNet(hidden_dim=16, output_dim=8, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), graph, feats)
    out, latent = model.apply(params, graph, feats)
    assert out.shape == (B, N_GRIP, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_hepi_non_depthwise_variant(toy):
    """conv.py groups=1 (full channel mixing) variant of FiberBundleConv."""
    from geometry_rl_tpu.models.ponita import FiberBundleConv

    graph, feats = toy
    es = graph.edges[("object_geometry", "task", "grippers")]
    conv = FiberBundleConv(channels=16, depthwise=False)
    x_src = jnp.ones((B, N_OBJ, 4, 16))
    x_dst = jnp.zeros((B, N_GRIP, 4, 16))
    params = conv.init(jax.random.PRNGKey(0), x_src, x_dst, es.src, es.dst, es.mask, jnp.ones((B, es.num_edges, 4, 8)), jnp.ones((4, 4, 8)))
    out = conv.apply(params, x_src, x_dst, es.src, es.dst, es.mask, jnp.ones((B, es.num_edges, 4, 8)), jnp.ones((4, 4, 8)))
    assert out.shape == (B, N_GRIP, 4, 16)
    assert np.isfinite(np.asarray(out)).all()
