"""Visibility-budget compaction parity (deformable_cross_attention.py:759-783
semantics): compacted attention must match the masked-dense path exactly
whenever the budget covers every visible voxel in every camera."""
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from sgcdet_tpu.models.view_transformer import DeformCrossAttention


def _setup(k=512, n=3, c=64, d=6, h_img=12, w_img=16, seed=0, vis_per_cam=90):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    value_img = jax.random.normal(ks[0], (n, h_img, w_img, c), jnp.float32)
    dpt_img = jax.nn.softmax(jax.random.normal(ks[1], (n, h_img, w_img, d)), -1)
    ref_cam = jax.random.uniform(ks[2], (n, k, 3), minval=0.05, maxval=0.95)
    query = jnp.zeros((k, c), jnp.float32)
    # controlled visibility: ~vis_per_cam visible voxels per camera
    rng = np.random.RandomState(seed)
    mask = np.zeros((n, k), bool)
    for i in range(n):
        mask[i, rng.choice(k, vis_per_cam, replace=False)] = True
    return query, value_img, dpt_img, ref_cam, jnp.asarray(mask)


def _run(budget, args, seed=0):
    query, value_img, dpt_img, ref_cam, mask = args
    mod = DeformCrossAttention(
        embed_dims=value_img.shape[-1], num_heads=4, num_points=2,
        query_chunk=None, visibility_budget=budget,
    )
    variables = mod.init(
        jax.random.PRNGKey(seed), query, value_img, dpt_img, ref_cam, mask,
        ((value_img.shape[1], value_img.shape[2]),),
    )
    out = mod.apply(
        variables, query, value_img, dpt_img, ref_cam, mask,
        ((value_img.shape[1], value_img.shape[2]),),
    )
    return variables, out


def test_budget_exact_when_covering():
    args = _setup()
    v_dense, dense = _run(None, args)
    v_comp, comp = _run(0.25, args)  # budget -> 128 >= 90 visible
    # identical parameter trees (compaction adds no params)
    assert jax.tree_util.tree_structure(v_dense) == jax.tree_util.tree_structure(v_comp)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(comp), atol=1e-5)


def test_budget_exact_with_grads():
    args = _setup(seed=3)
    query, value_img, dpt_img, ref_cam, mask = args
    mod = DeformCrossAttention(embed_dims=value_img.shape[-1], num_heads=4,
                               num_points=2, query_chunk=None,
                               visibility_budget=None)
    variables = mod.init(jax.random.PRNGKey(0), query, value_img, dpt_img,
                         ref_cam, mask, ((12, 16),))

    def loss(v, budget):
        m = DeformCrossAttention(embed_dims=value_img.shape[-1], num_heads=4,
                                 num_points=2, query_chunk=None,
                                 visibility_budget=budget)
        out = m.apply(v, query, value_img, dpt_img, ref_cam, mask, ((12, 16),))
        return jnp.sum(out ** 2)

    g_dense = jax.grad(lambda v: loss(v, None))(variables)
    g_comp = jax.grad(lambda v: loss(v, 0.25))(variables)
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dense)
    flat_c, _ = jax.flatten_util.ravel_pytree(g_comp)
    np.testing.assert_allclose(np.asarray(flat_d), np.asarray(flat_c),
                               atol=2e-4)


def test_budget_too_small_keeps_lowest_indices():
    # with budget < visible count, only the selected (lowest-index visible)
    # voxels participate; output stays finite and invisible voxels stay zero
    args = _setup(vis_per_cam=300, seed=5)
    query, value_img, dpt_img, ref_cam, mask = args
    _, out = _run(0.25, args)  # 128 < 300 visible
    assert np.isfinite(np.asarray(out)).all()
    novis = ~np.asarray(mask).any(axis=0)
    np.testing.assert_allclose(np.asarray(out)[novis], 0.0, atol=1e-6)


def test_auto_budget_sizing_is_exact_at_model_level():
    """derive_visibility_budget's bound (over ALL voxels per level) must make
    the compacted lifting exactly reproduce the dense path for any top-k
    selection (sparse_head levels select data-dependent subsets)."""
    import dataclasses

    from sgcdet_tpu.configs import scannet
    from sgcdet_tpu.models.sparse_head import AdaptiveSparseVolume
    from sgcdet_tpu.utils.visibility import derive_visibility_budget
    from tests.test_lifting_torch_parity import _geometry

    nvox = ((4, 4, 2), (8, 8, 4), (16, 16, 8))
    vsize = ((0.64, 0.64, 0.8), (0.32, 0.32, 0.4), (0.16, 0.16, 0.2))
    topk = (32, 128)
    img_shape = (32, 48)
    dbound = (0.2, 3.4, 0.4)
    proj, origin = _geometry(4)

    mcfg = dataclasses.replace(
        scannet().model, n_voxels_list=nvox, voxel_size_list=vsize,
        topk_list=topk, dbound=dbound,
    )
    budget = derive_visibility_budget(
        [(origin, proj)], img_shape, mcfg, margin=1.0
    )
    assert 0.0 < budget <= 1.0

    d_ch = round((dbound[1] - dbound[0]) / dbound[2])
    key = jax.random.PRNGKey(0)
    feats, dpts = [], []
    h4, w4 = img_shape[0] // 4, img_shape[1] // 4
    for lvl in range(3):
        h_l, w_l = h4 // (2 ** lvl), w4 // (2 ** lvl)
        k1, k2, key = jax.random.split(key, 3)
        feats.append(jax.random.normal(k1, (4, 32, h_l, w_l)))
        dpts.append(jax.nn.softmax(jax.random.normal(k2, (4, d_ch, h_l, w_l)), 1))

    def run(vb):
        model = AdaptiveSparseVolume(
            embed_dims=32, voxel_size_list=vsize, n_voxels_list=nvox,
            topk_list=topk, num_heads=4, num_points=2, query_chunk=None,
            visibility_budget=vb,
        )
        variables = model.init(
            jax.random.PRNGKey(1), feats, dpts, jnp.asarray(origin),
            jnp.asarray(proj), img_shape, dbound,
        )
        return model.apply(
            variables, feats, dpts, jnp.asarray(origin), jnp.asarray(proj),
            img_shape, dbound,
        )

    vol_d, valid_d, occ_d = run(None)
    vol_c, valid_c, occ_c = run(budget if budget < 1.0 else None)
    np.testing.assert_allclose(np.asarray(vol_c), np.asarray(vol_d), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(valid_c), np.asarray(valid_d))

    # per-level budgets (derive_visibility_budgets): tighter than the scalar
    # max-over-levels bound on at least one level, still exactly dense
    from sgcdet_tpu.utils.visibility import derive_visibility_budgets

    budgets = derive_visibility_budgets([(origin, proj)], img_shape, mcfg,
                                        margin=1.0)
    assert len(budgets) == len(nvox)
    assert max(budgets) == budget
    vol_p, valid_p, occ_p = run(tuple(budgets))
    np.testing.assert_allclose(np.asarray(vol_p), np.asarray(vol_d), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(valid_p), np.asarray(valid_d))
