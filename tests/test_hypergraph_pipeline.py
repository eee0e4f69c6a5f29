"""End-to-end hypergraph construction on synthetic fixtures, with a NumPy
oracle check of the per-stage math (reference preprocess_hypergraph.py)."""

import numpy as np
import pytest

from multimodal_fusion_tpu.hypergraph.build import (
    aggregate_wsi_super_patches,
    build_hypergraph_knn_kmeans,
    compute_wsi_tma_similarity,
    group_by_similarity,
    load_similarity_matrices,
    process_dataset,
    process_single_file,
    rebuild_hypergraph_from_similarity,
)
from multimodal_fusion_tpu.io.fixtures import make_synthetic_dataset
from multimodal_fusion_tpu.io.h5io import read_hypergraph_group, write_channel


@pytest.fixture(scope="module")
def hg_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("hg")
    csv_path = make_synthetic_dataset(
        root, n_patients=3, seed=1, min_wsi_patches=60, max_wsi_patches=80, feature_dim=32
    )
    # pipeline consumes flat tma/features; fixtures store per-marker — add flat
    import h5py

    for line in csv_path.read_text().strip().split("\n")[1:]:
        rel = line.split(",")[-1]
        with h5py.File(root / rel, "a") as f:
            parts = [np.asarray(f[f"tma/{m}/features"]) for m in sorted(f["tma"].keys())]
            f["tma/features"] = np.concatenate(parts)
    return root, csv_path


def test_aggregate_super_patches():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((50, 16)).astype(np.float32)
    pos = rng.standard_normal((50, 2)).astype(np.float32)
    sp_f, sp_p, stats, K = aggregate_wsi_super_patches(feats, pos, 5, seed=0)
    assert sp_f.shape == (5, 16)
    assert sp_p.shape == (5, 2)
    assert K.shape == (50, 50)
    assert stats["num_original_patches"] == 50
    assert 0 < stats["avg_intra_cluster_similarity"] <= 1.0
    # super-patch features are means of their clusters: global mean invariant
    # under weighted recombination
    # (cluster means weighted by size == overall mean)
    from multimodal_fusion_tpu.ops.kmeans import kmeans
    import jax

    res = kmeans(jax.random.key(0), feats, k=5, n_init=10)
    labels = np.asarray(res.labels)
    for c in range(5):
        np.testing.assert_allclose(
            sp_f[c], feats[labels == c].mean(0), rtol=1e-4, atol=1e-5
        )


def test_cross_similarity_morphological_only():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((6, 8)).astype(np.float32) * 0.3
    b = rng.standard_normal((4, 8)).astype(np.float32) * 0.3
    sim, stats = compute_wsi_tma_similarity(a, b)
    want = np.exp(-((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    np.testing.assert_allclose(sim, want, rtol=1e-4, atol=1e-5)
    assert abs(stats["median"] - np.median(want)) < 1e-5


def test_group_by_similarity():
    rng = np.random.default_rng(2)
    sim = rng.random((20, 6)).astype(np.float32)
    labels, stats = group_by_similarity(sim, 3, "kmeans")
    assert labels.shape == (20,)
    assert set(labels) <= {0, 1, 2}
    assert sum(stats["group_sizes"]) == 20


def test_build_hypergraph_structure():
    rng = np.random.default_rng(3)
    wsi = rng.standard_normal((12, 8)).astype(np.float32)
    tma = rng.standard_normal((4, 8)).astype(np.float32)
    ei, w, stats = build_hypergraph_knn_kmeans(wsi, tma, None, k=3, num_hyperedges=4)
    assert ei.shape[0] == 2
    assert w.shape[0] == ei.shape[1]
    assert (w >= 0).all()
    # canonical order: undirected pairs sorted, no duplicates, no self loops
    pairs = ei.T
    assert (pairs[:, 0] < pairs[:, 1]).all()
    assert len(np.unique(pairs, axis=0)) == len(pairs)
    # every node's knn edges present: node degree >= 1
    deg = np.bincount(pairs.ravel(), minlength=16)
    assert (deg > 0).all()
    assert stats["num_nodes"] == 16


def test_skip_existing_resume(tmp_path):
    """``skip_existing`` resume mode: a second run over a built dataset
    skips every complete file untouched; a file whose hypergraph group lost
    its ``stats`` completion marker (crash mid-write) is rebuilt."""
    import h5py

    root = tmp_path
    csv_path = make_synthetic_dataset(
        root, n_patients=3, seed=5, min_wsi_patches=50, max_wsi_patches=60,
        feature_dim=16,
    )
    for line in csv_path.read_text().strip().split("\n")[1:]:
        rel = line.split(",")[-1]
        with h5py.File(root / rel, "a") as f:
            parts = [np.asarray(f[f"tma/{m}/features"]) for m in sorted(f["tma"].keys())]
            f["tma/features"] = np.concatenate(parts)
    rels = [l.split(",")[-1] for l in csv_path.read_text().strip().split("\n")[1:]]

    stats1, summary1 = process_dataset(csv_path, root, 6, 2, 2, 3)
    assert summary1["files"] == 3 and summary1["total_patches"] > 0

    # plant a sentinel: a skipped file must not be rewritten
    with h5py.File(root / rels[0], "a") as f:
        f["hypergraph"].attrs["sentinel"] = "untouched"

    stats2, summary2 = process_dataset(csv_path, root, 6, 2, 2, 3, skip_existing=True)
    assert summary2["files"] == 3 and summary2["total_patches"] == 0
    assert all(s.get("reason") == "existing_hypergraph" for s in stats2)
    with h5py.File(root / rels[0], "r") as f:
        assert f["hypergraph"].attrs["sentinel"] == "untouched"

    # simulate a crash mid-write: completion marker gone -> that ONE file
    # rebuilds, the others stay skipped
    with h5py.File(root / rels[1], "a") as f:
        del f["hypergraph"].attrs["stats"]
    stats3, summary3 = process_dataset(csv_path, root, 6, 2, 2, 3, skip_existing=True)
    assert summary3["total_patches"] > 0
    reasons = [s.get("reason") for s in stats3]
    assert reasons.count("existing_hypergraph") == 2
    with h5py.File(root / rels[1], "r") as f:
        assert "stats" in f["hypergraph"].attrs  # rebuilt to completion

    # batched driver honors the same filter
    stats4, summary4 = process_dataset(
        csv_path, root, 6, 2, 2, 3, skip_existing=True, file_batch=3
    )
    assert summary4["files"] == 3 and summary4["total_patches"] == 0

    # similarity-aware completeness: files built WITHOUT the similarity
    # cache must NOT satisfy a resumed save_similarity=True build (review
    # finding) — rebuild all, caches materialize
    stats5, _ = process_dataset(
        csv_path, root, 6, 2, 2, 3, save_similarity=False
    )
    stats6, summary6 = process_dataset(csv_path, root, 6, 2, 2, 3, skip_existing=True)
    assert summary6["total_patches"] > 0
    assert not any(s.get("reason") == "existing_hypergraph" for s in stats6)
    with h5py.File(root / rels[0], "r") as f:
        assert "hypergraph/similarity/wsi_internal" in f
    # ...and once the caches exist, the similarity-aware skip holds
    _, summary7 = process_dataset(csv_path, root, 6, 2, 2, 3, skip_existing=True)
    assert summary7["total_patches"] == 0


def test_process_and_rebuild_roundtrip(hg_dataset):
    root, csv_path = hg_dataset
    all_stats, summary = process_dataset(
        csv_path, root, num_wsi_super_patches=8, num_groups=3,
        hypergraph_k=3, num_hyperedges=4,
    )
    assert summary["files"] == 3
    assert summary["patches_per_sec"] > 0
    rel = csv_path.read_text().strip().split("\n")[1].split(",")[-1]
    h5 = root / rel
    out = read_hypergraph_group(h5)
    assert out["wsi_super/features"].shape[0] == 8
    assert out["edge_index"].shape[0] == 2
    assert out["group_labels"].shape[0] == 8
    assert "similarity/wsi_internal" in out
    assert "__stats__" in out

    # deterministic: same seed -> identical incidence structure
    stats2 = process_single_file(h5, 8, 3, 3, 4)
    out2 = read_hypergraph_group(h5)
    np.testing.assert_array_equal(out["edge_index"], out2["edge_index"])
    np.testing.assert_allclose(out["edge_weights"], out2["edge_weights"], rtol=1e-5)

    # fast rebuild from cached similarity with different params
    wsi_sim, wsi_tma_sim = load_similarity_matrices(h5)
    assert wsi_sim is not None
    stats3 = rebuild_hypergraph_from_similarity(
        h5, num_wsi_super_patches=6, num_groups=2, hypergraph_k=2, num_hyperedges=3
    )
    out3 = read_hypergraph_group(h5)
    assert out3["wsi_super/features"].shape[0] == 6
    assert len(np.unique(out3["group_labels"])) <= 2

    # threshold filter drops edges
    stats4 = rebuild_hypergraph_from_similarity(
        h5, num_wsi_super_patches=6, num_groups=2, hypergraph_k=2,
        num_hyperedges=3, threshold_median_ratio=1.0,
    )
    assert stats4["hypergraph"]["num_edges_after_threshold"] <= stats3["hypergraph"]["num_edges"]


def test_build_weighted_hypergraph_dense(rng):
    """Dense thresholded graph vs a transcribed oracle of the reference's
    N^2 loop (similarity_kernel.py:126-212)."""
    from multimodal_fusion_tpu.hypergraph.dense_graph import (
        build_hypergraph_data,
        build_weighted_hypergraph,
        mean_pool_with_similarity,
    )

    f = rng.standard_normal((12, 6)).astype(np.float32) * 0.3
    p = rng.standard_normal((12, 2)).astype(np.float32) * 0.3
    ei, w = build_weighted_hypergraph(f, p, 0.8, 0.5, threshold_median_ratio=1.0)
    # oracle
    d_h = ((f[:, None] - f[None]) ** 2).sum(-1)
    d_g = ((p[:, None] - p[None]) ** 2).sum(-1)
    K = np.exp(-0.8 * d_h) * np.exp(-0.5 * d_g)
    off = np.sort(K[~np.eye(12, dtype=bool)])
    med = off[(off.size - 1) // 2]  # torch.median: LOWER middle (parity)
    keep = K >= med * 1.0
    src, dst = np.nonzero(keep)
    np.testing.assert_array_equal(ei, np.stack([src, dst]))
    np.testing.assert_allclose(w, K[src, dst], rtol=2e-3, atol=1e-4)
    # no-threshold keeps all N^2 edges; n<=1 raises
    ei2, _ = build_weighted_hypergraph(f, p)
    assert ei2.shape[1] == 144
    import pytest

    with pytest.raises(ValueError):
        build_weighted_hypergraph(f[:1], p[:1])

    data = build_hypergraph_data(f, p, use_pooling=True)
    assert set(data) == {"x", "edge_index", "edge_attr", "pos", "pooled_feature"}
    np.testing.assert_allclose(
        data["pooled_feature"], f.mean(0, keepdims=True), rtol=1e-5, atol=1e-6
    )
    legacy = build_hypergraph_data(f, p, legacy_keys=True)
    assert "pooled_features" in legacy
    np.testing.assert_allclose(
        mean_pool_with_similarity(f, p, 1.0, 1.0), f.mean(0, keepdims=True),
        rtol=1e-5, atol=1e-6,
    )


def test_extra_models_forward():
    import jax
    import jax.numpy as jnp

    from multimodal_fusion_tpu.config import ModelConfig
    from multimodal_fusion_tpu.models.factory import ModelFactory

    D = 32
    rng2 = np.random.default_rng(0)
    case = {
        "channels": {
            "wsi=features": jnp.asarray(rng2.standard_normal((16, D)), jnp.float32),
            "tma=cd3=features": jnp.asarray(rng2.standard_normal((4, D)), jnp.float32),
            "tma=cd8=features": jnp.asarray(rng2.standard_normal((4, D)), jnp.float32),
        },
        "masks": {
            "wsi=features": jnp.ones(16, bool),
            "tma=cd3=features": jnp.ones(4, bool),
            "tma=cd8=features": jnp.ones(4, bool),
        },
    }
    cfg = ModelConfig(
        model_type="svd_clam", n_classes=2, input_dim=D, model_size="32*16",
        dropout=0.1, output_dim=D,
        channels_used_in_model=["wsi=features", "tma=cd3=features", "tma=cd8=features"],
        lambda2=0.1,
    )
    m = ModelFactory.create_model(cfg, seed=0)
    out = m(case, jnp.asarray(1), key=jax.random.key(0), train=True)
    assert np.isfinite(float(out["svd_loss"]))
    loss = m.loss_fn(out["logits"], jnp.asarray([1]), out)
    assert np.isfinite(float(loss))

    cfg2 = ModelConfig(
        model_type="auto_connections", n_classes=2, input_dim=D, model_size="32*16",
        dropout=0.1, output_dim=D,
        channels_used_in_model=["wsi=features", "tma=cd3=features", "tma=cd8=features"],
    )
    cfg2.extra.update(views_num=3, token_dim=D, inference_depth=2)
    m2 = ModelFactory.create_model(cfg2, seed=0)
    X = m2(case, jnp.asarray(0), key=jax.random.key(1), train=False)
    # 2 modality tokens + 2 layers x 3 views
    assert X.shape == (2 + 6, D)


def test_no_cache_large_n_path(tmp_path):
    """save_similarity=False must never materialize [N,N]; stats come from a
    subsample and no similarity datasets land in the h5."""
    import h5py

    from multimodal_fusion_tpu.hypergraph.build import process_single_file
    from multimodal_fusion_tpu.io.h5io import read_hypergraph_group

    rng = np.random.default_rng(4)
    p = tmp_path / "big.h5"
    with h5py.File(p, "w") as f:
        f["wsi/features"] = rng.standard_normal((300, 16)).astype(np.float32)
        f["wsi/positions"] = rng.integers(0, 1000, (300, 2)).astype(np.float32)
        f["tma/features"] = rng.standard_normal((8, 16)).astype(np.float32)
    stats = process_single_file(p, 6, 2, 2, 3, save_similarity=False)
    out = read_hypergraph_group(p)
    assert "similarity/wsi_internal" not in out
    assert out["wsi_super/features"].shape == (6, 16)
    assert np.isfinite(stats["wsi_aggregation"]["avg_intra_cluster_similarity"])
    assert stats["hypergraph"]["num_edges"] > 0


def test_file_batched_build_matches_unbatched(tmp_path):
    """file_batch > 1 groups same-shape files through one vmapped fused
    build; outputs must match the per-file path (same seed per file):
    identical edge sets, matching super-patch features."""
    import h5py

    from multimodal_fusion_tpu.hypergraph.build import process_dataset
    from multimodal_fusion_tpu.io.h5io import read_hypergraph_group

    rng = np.random.default_rng(8)

    def write_ds(root, n_per_file):
        root.mkdir()
        rows = []
        for i, n in enumerate(n_per_file):
            p = root / f"case_{i}.h5"
            r2 = np.random.default_rng(100 + i)  # same data in both dirs
            with h5py.File(p, "w") as f:
                f["wsi/features"] = (r2.standard_normal((n, 16)) * 0.3).astype(np.float32)
                f["wsi/positions"] = r2.uniform(0, 3, (n, 2)).astype(np.float32)
                f["tma/features"] = (r2.standard_normal((6, 16)) * 0.3).astype(np.float32)
            rows.append(f"case_{i},case_{i},living,{p.name}")
        (root / "d.csv").write_text(
            "patient_id,case_id,label,h5_file_path\n"
            + "\n".join(f"{i},{r.split(',',1)[1]}" for i, r in enumerate(rows))
        )
        return root / "d.csv"

    # two shape groups: 3 files of 50 patches, 2 of 70
    shapes = [50, 50, 70, 50, 70]
    csv_a = write_ds(tmp_path / "a", shapes)
    csv_b = write_ds(tmp_path / "b", shapes)

    stats_a, _ = process_dataset(csv_a, tmp_path / "a", 8, 3, 2, 4)
    stats_b, summary_b = process_dataset(csv_b, tmp_path / "b", 8, 3, 2, 4, file_batch=3)
    assert summary_b["total_patches"] == sum(shapes)
    assert all("error" not in s for s in stats_a)
    assert all("error" not in s for s in stats_b), stats_b

    for i in range(len(shapes)):
        a = read_hypergraph_group(tmp_path / "a" / f"case_{i}.h5")
        b = read_hypergraph_group(tmp_path / "b" / f"case_{i}.h5")
        ea = set(map(tuple, np.sort(a["edge_index"].T, axis=1).tolist()))
        eb = set(map(tuple, np.sort(b["edge_index"].T, axis=1).tolist()))
        assert ea == eb, f"file {i}: edge sets differ"
        np.testing.assert_allclose(
            np.sort(a["wsi_super/features"], axis=0),
            np.sort(b["wsi_super/features"], axis=0),
            rtol=1e-4, atol=1e-5,
        )


def test_upload_dtype_bf16_build(tmp_path):
    """upload_dtype='bfloat16' ships features in bf16 and casts back to f32
    on device: where geometry FORCES the structure (num_super == number of
    blobs, as in test_clustering_parity's forced regime) edges and group
    sizes must match the f32 build exactly, and similarity statistics must
    agree to ~1% (bf16 input quantisation).  In tie-sensitive regimes the
    quantisation acts like a seed change, same as sklearn-vs-ours
    (PARITY.md)."""
    import h5py

    from multimodal_fusion_tpu.hypergraph.build import process_dataset
    from multimodal_fusion_tpu.io.h5io import read_hypergraph_group

    def write_ds(root):
        root.mkdir()
        rng = np.random.default_rng(11)
        n, D, B = 240, 32, 5
        centers = rng.standard_normal((B, D)) * np.sqrt(1.75 / D)
        pos_centers = rng.uniform(0, 4, (B, 2))
        a = rng.integers(0, B, n)
        p = root / "case_0.h5"
        with h5py.File(p, "w") as f:
            f["wsi/features"] = (
                centers[a] + rng.standard_normal((n, D)) * np.sqrt(0.25 / D)
            ).astype(np.float32)
            f["wsi/positions"] = (
                pos_centers[a] + rng.normal(0, 0.3, (n, 2))
            ).astype(np.float32)
            f["tma/features"] = (
                centers[rng.integers(0, B, 6)]
                + rng.standard_normal((6, D)) * np.sqrt(0.25 / D)
            ).astype(np.float32)
        (root / "d.csv").write_text(
            "patient_id,case_id,label,h5_file_path\n0,case_0,living,case_0.h5\n"
        )
        return root / "d.csv"

    csv_a, csv_b = write_ds(tmp_path / "a"), write_ds(tmp_path / "b")
    stats_a, _ = process_dataset(csv_a, tmp_path / "a", 5, 3, 2, 4)
    stats_b, _ = process_dataset(
        csv_b, tmp_path / "b", 5, 3, 2, 4, upload_dtype="bfloat16"
    )
    assert all("error" not in s for s in stats_a), stats_a
    assert all("error" not in s for s in stats_b), stats_b

    a = read_hypergraph_group(tmp_path / "a" / "case_0.h5")
    b = read_hypergraph_group(tmp_path / "b" / "case_0.h5")
    ea = set(map(tuple, np.sort(a["edge_index"].T, axis=1).tolist()))
    eb = set(map(tuple, np.sort(b["edge_index"].T, axis=1).tolist()))
    assert ea == eb
    assert sorted(np.bincount(a["group_labels"]).tolist()) == sorted(
        np.bincount(b["group_labels"]).tolist()
    )
    sa = stats_a[0]["wsi_aggregation"]["wsi_similarity_matrix_stats"]
    sb = stats_b[0]["wsi_aggregation"]["wsi_similarity_matrix_stats"]
    for k in ("mean", "std", "max"):
        assert abs(sa[k] - sb[k]) <= 0.01 * max(abs(sa[k]), 1e-3), (k, sa, sb)
    # bad dtype rejected
    with pytest.raises(ValueError):
        process_dataset(csv_a, tmp_path / "a", 5, 3, 2, 4, upload_dtype="fp8")


def test_blockwise_stats_exact(tmp_path, monkeypatch):
    """Above FULL_STATS_MAX_N the DEFAULT path streams the [N,N] similarity
    blockwise (LARGE_N_STATS='blockwise'): mean/std/min/max and the
    intra-cluster statistic must EQUAL the full-stats numbers to f32
    rounding — [N,N] never materialised.  Forced by lowering the boundary."""
    import h5py

    import multimodal_fusion_tpu.hypergraph.build as build_mod

    rng = np.random.default_rng(12)
    feats = (rng.standard_normal((300, 16)) * 0.3).astype(np.float32)
    pos = rng.uniform(0, 3, (300, 2)).astype(np.float32)
    tma = (rng.standard_normal((8, 16)) * 0.3).astype(np.float32)
    for name in ("full.h5", "block.h5"):
        with h5py.File(tmp_path / name, "w") as f:
            f["wsi/features"] = feats
            f["wsi/positions"] = pos
            f["tma/features"] = tma

    full = build_mod.process_single_file(
        tmp_path / "full.h5", 6, 2, 2, 3, save_similarity=False
    )
    monkeypatch.setattr(build_mod, "FULL_STATS_MAX_N", 100)
    block = build_mod.process_single_file(
        tmp_path / "block.h5", 6, 2, 2, 3, save_similarity=False
    )
    fs = full["wsi_aggregation"]["wsi_similarity_matrix_stats"]
    bs = block["wsi_aggregation"]["wsi_similarity_matrix_stats"]
    for k in ("mean", "std", "min", "max"):
        np.testing.assert_allclose(bs[k], fs[k], rtol=1e-5, atol=1e-8, err_msg=k)
    # n=300 <= 2048, so the median subsample covers every row -> exact too
    np.testing.assert_allclose(bs["median"], fs["median"], rtol=1e-5)
    np.testing.assert_allclose(
        block["wsi_aggregation"]["avg_intra_cluster_similarity"],
        full["wsi_aggregation"]["avg_intra_cluster_similarity"],
        rtol=1e-5,
    )
    # identical structure downstream (same kmeans/knn inputs)
    assert block["hypergraph"]["num_edges"] == full["hypergraph"]["num_edges"]


def test_blockwise_stats_oracle_multiblock():
    """Direct oracle check of _blockwise_similarity_stats with a block size
    that forces multiple scan steps AND row padding (300 % 64 != 0), plus the
    padded-bucket mode (trailing zero rows masked out of every statistic)."""
    import jax.numpy as jnp

    from multimodal_fusion_tpu.hypergraph.build import _blockwise_similarity_stats
    from multimodal_fusion_tpu.ops.similarity import combined_similarity

    rng = np.random.default_rng(0)
    n, d, s = 300, 16, 6
    feats = jnp.asarray(rng.standard_normal((n, d)) * 0.3, jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 3, (n, 2)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, s, n), jnp.int32)
    onehot = jnp.asarray(np.eye(s, dtype=np.float32)[np.asarray(labels)])

    K = combined_similarity(feats, pos, 1.0, 1.0)
    ref = (
        float(K.sum()),
        float((K * K).sum()),
        float(K.min()),
        float(K.max()),
        np.asarray(jnp.einsum("ns,ns->s", onehot, K @ onehot)),
        np.asarray(onehot.T @ jnp.diagonal(K)),
    )

    def check(out):
        got = [np.asarray(x) for x in out]
        for g, r in zip(got, ref):
            np.testing.assert_allclose(g, r, rtol=1e-5)

    check(
        _blockwise_similarity_stats(
            feats, pos, 1.0, 1.0, labels, s, jnp.int32(n), False, block=64
        )
    )
    # padded-bucket mode: 20 trailing garbage rows, labels -1 (pre-masked
    # like _fused_build), n_valid=300
    npad = 320
    fp = jnp.ones((npad, d)).at[:n].set(feats)
    pp = jnp.ones((npad, 2)).at[:n].set(pos)
    lp = jnp.full((npad,), -1, jnp.int32).at[:n].set(labels)
    check(
        _blockwise_similarity_stats(
            fp, pp, 1.0, 1.0, lp, s, jnp.int32(n), True, block=64
        )
    )


def test_sampled_stats_path_forced(tmp_path, monkeypatch):
    """The legacy huge-N path (LARGE_N_STATS='sampled': statistics from a
    <=2048-point subsample, no O(N^2 D) pass at all) — forced by lowering
    FULL_STATS_MAX_N, since real 1e5-patch fixtures don't fit a CPU test."""
    import h5py

    import multimodal_fusion_tpu.hypergraph.build as build_mod

    monkeypatch.setattr(build_mod, "FULL_STATS_MAX_N", 100)
    monkeypatch.setattr(build_mod, "LARGE_N_STATS", "sampled")
    rng = np.random.default_rng(12)
    p = tmp_path / "big.h5"
    with h5py.File(p, "w") as f:
        f["wsi/features"] = (rng.standard_normal((300, 16)) * 0.3).astype(np.float32)
        f["wsi/positions"] = rng.uniform(0, 3, (300, 2)).astype(np.float32)
        f["tma/features"] = (rng.standard_normal((8, 16)) * 0.3).astype(np.float32)
    stats = build_mod.process_single_file(p, 6, 2, 2, 3, save_similarity=False)
    assert "error" not in stats
    assert np.isfinite(stats["wsi_aggregation"]["avg_intra_cluster_similarity"])
    assert np.isfinite(stats["wsi_aggregation"]["wsi_similarity_matrix_stats"]["mean"])
    assert stats["hypergraph"]["num_edges"] > 0
    from multimodal_fusion_tpu.io.h5io import read_hypergraph_group

    out = read_hypergraph_group(p)
    assert "similarity/wsi_internal" not in out

    # the batched driver takes the same sampled path
    import csv

    with open(tmp_path / "d.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["patient_id", "case_id", "label", "h5_file_path"])
        w.writeheader()
        w.writerow({"patient_id": 0, "case_id": "big", "label": "living",
                    "h5_file_path": p.name})
    stats2, summary = build_mod.process_dataset(
        tmp_path / "d.csv", tmp_path, 6, 2, 2, 3, save_similarity=False, file_batch=2
    )
    assert all("error" not in s for s in stats2), stats2
    assert summary["total_patches"] == 300


def test_bucketed_build(tmp_path):
    """Patch-count bucketing: padded builds succeed, similarity statistics
    are EXACT (masked nan-stats equal the unpadded stats), no padded node
    leaks into the hypergraph, and two different patch counts land on the
    same padded shape (one compile serves the bucket)."""
    import h5py

    from multimodal_fusion_tpu.hypergraph.build import (
        _bucketed,
        process_single_file,
    )
    from multimodal_fusion_tpu.io.h5io import read_hypergraph_group

    rng = np.random.default_rng(21)

    def write(p, n):
        r = np.random.default_rng(50)  # same leading rows across files
        feats = (r.standard_normal((n, 16)) * 0.4).astype(np.float32)
        pos = r.uniform(0, 3, (n, 2)).astype(np.float32)
        with h5py.File(p, "w") as f:
            f["wsi/features"] = feats
            f["wsi/positions"] = pos
            f["tma/features"] = (r.standard_normal((6, 16)) * 0.4).astype(np.float32)

    # same file, exact vs bucketed: similarity stats identical
    pa, pb = tmp_path / "a.h5", tmp_path / "b.h5"
    write(pa, 300)
    write(pb, 300)
    s_exact = process_single_file(pa, 8, 3, 2, 4, save_similarity=False)
    s_bucket = process_single_file(
        pb, 8, 3, 2, 4, save_similarity=False, bucket_patches=128
    )
    for k in ("mean", "std", "min", "max", "median"):
        np.testing.assert_allclose(
            s_bucket["wsi_aggregation"]["wsi_similarity_matrix_stats"][k],
            s_exact["wsi_aggregation"]["wsi_similarity_matrix_stats"][k],
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
    assert s_bucket["wsi_aggregation"]["num_original_patches"] == 300
    assert np.isfinite(s_bucket["wsi_aggregation"]["avg_intra_cluster_similarity"])
    out = read_hypergraph_group(pb)
    n_nodes = 8 + 6
    assert out["edge_index"].max() < n_nodes
    assert out["wsi_super/features"].shape == (8, 16)
    assert np.isfinite(out["wsi_super/features"]).all()
    # padded rows must not drag super-patch features toward zero rows:
    # every super-patch is a mean of real patches (nonzero)
    assert (np.abs(out["wsi_super/features"]).sum(1) > 1e-3).all()

    # different patch counts -> same bucketed shape (one compile per bucket)
    f1, _, n1, _ = _bucketed(np.zeros((300, 4), np.float32), np.zeros((300, 2), np.float32), 512)
    f2, _, n2, _ = _bucketed(np.zeros((450, 4), np.float32), np.zeros((450, 2), np.float32), 512)
    assert f1.shape == f2.shape == (512, 4)
    assert (n1, n2) == (300, 450)


def test_bucketed_batched_matches_bucketed_unbatched(tmp_path):
    """bucket_patches + file_batch: heterogeneous patch counts collapse into
    one bucket group and one vmapped program; outputs match the unbatched
    bucketed path exactly (same per-file seed, same padded shapes)."""
    import h5py

    from multimodal_fusion_tpu.hypergraph.build import process_dataset
    from multimodal_fusion_tpu.io.h5io import read_hypergraph_group

    def write_ds(root, n_per_file):
        root.mkdir()
        rows = []
        for i, n in enumerate(n_per_file):
            r2 = np.random.default_rng(300 + i)
            p = root / f"case_{i}.h5"
            with h5py.File(p, "w") as f:
                f["wsi/features"] = (r2.standard_normal((n, 16)) * 0.3).astype(np.float32)
                f["wsi/positions"] = r2.uniform(0, 3, (n, 2)).astype(np.float32)
                f["tma/features"] = (r2.standard_normal((6, 16)) * 0.3).astype(np.float32)
            rows.append(f"{i},case_{i},living,{p.name}")
        (root / "d.csv").write_text(
            "patient_id,case_id,label,h5_file_path\n" + "\n".join(rows)
        )
        return root / "d.csv"

    shapes = [40, 55, 70, 90]  # all land in one 128-bucket
    csv_a = write_ds(tmp_path / "a", shapes)
    csv_b = write_ds(tmp_path / "b", shapes)

    stats_a, _ = process_dataset(
        csv_a, tmp_path / "a", 8, 3, 2, 4, save_similarity=False, bucket_patches=128
    )
    stats_b, summary_b = process_dataset(
        csv_b, tmp_path / "b", 8, 3, 2, 4, save_similarity=False,
        bucket_patches=128, file_batch=4,
    )
    assert all("error" not in s for s in stats_a), stats_a
    assert all("error" not in s for s in stats_b), stats_b
    assert summary_b["total_patches"] == sum(shapes)
    for i, n in enumerate(shapes):
        assert stats_b[i]["num_patches_processed"] == n
        a = read_hypergraph_group(tmp_path / "a" / f"case_{i}.h5")
        b = read_hypergraph_group(tmp_path / "b" / f"case_{i}.h5")
        ea = set(map(tuple, np.sort(a["edge_index"].T, axis=1).tolist()))
        eb = set(map(tuple, np.sort(b["edge_index"].T, axis=1).tolist()))
        assert ea == eb, f"file {i}"
        np.testing.assert_allclose(
            a["wsi_super/features"], b["wsi_super/features"], rtol=1e-4, atol=1e-5
        )


def test_empty_tma_dataset_builds(tmp_path):
    """A present-but-0-row TMA features dataset must BUILD (the batched
    probe routes such files into the build on purpose), with null similarity
    stats — not crash in a zero-size reduction (review finding)."""
    import json

    import h5py

    from multimodal_fusion_tpu.hypergraph.build import process_dataset
    from multimodal_fusion_tpu.io.h5io import read_hypergraph_group

    rng = np.random.default_rng(2)
    root = tmp_path
    p = root / "case_0.h5"
    with h5py.File(p, "w") as f:
        f["wsi/features"] = (rng.standard_normal((60, 16)) * 0.4).astype(np.float32)
        f["wsi/positions"] = rng.uniform(0, 2, (60, 2)).astype(np.float32)
        f["tma/features"] = np.zeros((0, 16), np.float32)
    (root / "d.csv").write_text(
        "patient_id,case_id,label,h5_file_path\n0,case_0,living,case_0.h5\n"
    )
    stats, summary = process_dataset(
        root / "d.csv", root, 6, 2, 2, 3,
        output_stats_path=root / "stats.json",
    )
    assert all("error" not in s for s in stats), stats
    assert summary["total_patches"] == 60
    out = read_hypergraph_group(p)
    assert out["tma/features"].shape[0] == 0
    assert out["edge_index"].shape[1] > 0  # super-patch KNN edges exist
    # stats JSON is strictly parseable (non-finite -> null)
    loaded = json.loads((root / "stats.json").read_text(), parse_constant=lambda c: (_ for _ in ()).throw(ValueError(c)))
    assert loaded["files"][0]["similarity"]["mean"] is None


def test_all_singleton_clusters_intra_mean_zero(tmp_path):
    """n == num_super_patches: every cluster is a singleton; the intra-
    cluster similarity must be the reference's 0.0, not NaN (review
    finding — NaN leaked into the stats JSON)."""
    import h5py

    from multimodal_fusion_tpu.hypergraph.build import process_single_file

    rng = np.random.default_rng(5)
    p = tmp_path / "s.h5"
    with h5py.File(p, "w") as f:
        f["wsi/features"] = (rng.standard_normal((6, 16)) * 0.4).astype(np.float32)
        f["wsi/positions"] = rng.uniform(0, 2, (6, 2)).astype(np.float32)
        f["tma/features"] = (rng.standard_normal((3, 16)) * 0.4).astype(np.float32)
    stats = process_single_file(p, 6, 2, 2, 3, save_similarity=False)
    assert stats["wsi_aggregation"]["avg_intra_cluster_similarity"] == 0.0


def test_blockwise_median_exact_beyond_subsample(tmp_path, monkeypatch):
    """The blockwise large-N median is EXACT (VERDICT r2 weak #5): at
    n=2500 > 2048 the legacy subsample no longer covers every row, so only
    the bit-pattern-histogram selection can match the full-stats
    ``jnp.median`` — asserted bit-for-bit."""
    import h5py

    import multimodal_fusion_tpu.hypergraph.build as build_mod

    rng = np.random.default_rng(5)
    n = 2500
    feats = (rng.standard_normal((n, 8)) * 0.3).astype(np.float32)
    pos = rng.uniform(0, 3, (n, 2)).astype(np.float32)
    tma = (rng.standard_normal((6, 8)) * 0.3).astype(np.float32)
    for name in ("full.h5", "block.h5"):
        with h5py.File(tmp_path / name, "w") as f:
            f["wsi/features"] = feats
            f["wsi/positions"] = pos
            f["tma/features"] = tma

    full = build_mod.process_single_file(
        tmp_path / "full.h5", 6, 2, 2, 3, save_similarity=False
    )
    monkeypatch.setattr(build_mod, "FULL_STATS_MAX_N", 100)
    block = build_mod.process_single_file(
        tmp_path / "block.h5", 6, 2, 2, 3, save_similarity=False
    )
    fs = full["wsi_aggregation"]["wsi_similarity_matrix_stats"]
    bs = block["wsi_aggregation"]["wsi_similarity_matrix_stats"]
    assert np.float32(bs["median"]) == np.float32(fs["median"])
    # padded-bucket mode must mask pad rows out of the median too
    block_pad = build_mod.process_single_file(
        tmp_path / "block.h5", 6, 2, 2, 3, save_similarity=False,
        bucket_patches=1024,
    )
    bp = block_pad["wsi_aggregation"]["wsi_similarity_matrix_stats"]
    assert np.float32(bp["median"]) == np.float32(fs["median"])


def test_blockwise_bf16_exact_stripes(tmp_path, monkeypatch):
    """Under --upload_dtype bfloat16 the blockwise stats/median stripes run
    the feature dot as a single bf16 MXU pass (VERDICT r4 #2: 6x the
    HIGHEST rate on the dominant distance matmuls).  The stats scan and
    every median refine sweep share the flag, so the internal bitwise
    contract (refine bin totals == stats histogram) holds on every backend
    — _select_key raises loudly on any divergence, which this build
    exercises at n=2500 (past subsample coverage, real bisection descent).
    Against the full-stats path the statistics agree to f32 rounding: on
    TPU the 1-pass bf16 dot is bit-identical to HIGHEST for bf16-shipped
    values; on CPU the bf16 gemm's accumulation order drifts by ulps (see
    pairwise_sq_dists docstring)."""
    import h5py
    import jax.numpy as jnp

    import multimodal_fusion_tpu.hypergraph.build as build_mod
    from multimodal_fusion_tpu.ops.similarity import pairwise_sq_dists

    rng = np.random.default_rng(7)
    n = 2500
    # bf16-representable features: exactly what arrives on device under
    # --upload_dtype bfloat16
    feats = (
        (rng.standard_normal((n, 8)) * 0.3)
        .astype(np.float32)
        .astype(jnp.bfloat16)
        .astype(np.float32)
    )
    pos = rng.uniform(0, 3, (n, 2)).astype(np.float32)
    tma = (rng.standard_normal((6, 8)) * 0.3).astype(np.float32)
    for name in ("full.h5", "block.h5"):
        with h5py.File(tmp_path / name, "w") as f:
            f["wsi/features"] = feats
            f["wsi/positions"] = pos
            f["tma/features"] = tma

    full = build_mod.process_single_file(
        tmp_path / "full.h5", 6, 2, 2, 3, save_similarity=False,
        upload_dtype="bfloat16",
    )
    monkeypatch.setattr(build_mod, "FULL_STATS_MAX_N", 100)
    block = build_mod.process_single_file(
        tmp_path / "block.h5", 6, 2, 2, 3, save_similarity=False,
        upload_dtype="bfloat16",
    )
    fs = full["wsi_aggregation"]["wsi_similarity_matrix_stats"]
    bs = block["wsi_aggregation"]["wsi_similarity_matrix_stats"]
    for k in ("mean", "std", "min", "max", "median"):
        np.testing.assert_allclose(bs[k], fs[k], rtol=2e-5, atol=2e-7, err_msg=k)

    # direct oracle: the bf16_exact stripe statistics against a full-matrix
    # K built with the SAME bf16-operand expansion
    from multimodal_fusion_tpu.hypergraph.build import _blockwise_similarity_stats

    fj = jnp.asarray(feats[:300])
    pj = jnp.asarray(pos[:300])
    labels = jnp.asarray(rng.integers(0, 4, 300), jnp.int32)
    K = jnp.exp(
        -(pairwise_sq_dists(fj, bf16_exact=True) + pairwise_sq_dists(pj))
    )
    out = _blockwise_similarity_stats(
        fj, pj, 1.0, 1.0, labels, 4, jnp.int32(300), False, block=64,
        bf16_exact=True,
    )
    np.testing.assert_allclose(float(out[0]), float(K.sum()), rtol=1e-6)
    np.testing.assert_allclose(float(out[1]), float((K * K).sum()), rtol=1e-6)
    # extrema sit at large |arg| where exp() turns the CPU bf16 gemm's ulp
    # drift in the distance into ~|Δarg| RELATIVE drift of the value
    np.testing.assert_allclose(float(out[2]), float(K.min()), rtol=1e-5)
    np.testing.assert_allclose(float(out[3]), float(K.max()), rtol=1e-5)


def test_exact_median_host_bisection():
    """_exact_median_host (scatter-free multi-level bit-pattern bisection)
    against np.median oracles: the dense common case, all-identical values,
    split middle ranks (even count with the two middles in far-apart
    ranges, so the two rank chains descend different subtrees), and the
    level-pass device kernel against a numpy counting oracle for every
    (shift, nbins) signature the descent uses."""
    import jax.numpy as jnp

    from multimodal_fusion_tpu.hypergraph.build import (
        _MED_FANOUT,
        _MED_L1_SHIFT,
        _exact_median_host,
        _median_level_pass,
    )

    def np_counts(keys, lo_key, shift, nbins):
        rel = keys - lo_key
        idx = rel >> shift
        ok = (rel >= 0) & (idx < nbins)
        return np.bincount(idx[ok], minlength=nbins).astype(np.int64)

    def run_case(values):
        """values: 1-D f32 in [0,1]; median of the n x n outer 'matrix'
        whose rows are identical copies (median == median of values)."""
        n = values.shape[0]
        keys = np.repeat(
            np.asarray(values, np.float32).view(np.int32).astype(np.int64), n
        )
        l1 = np_counts(keys, 0, _MED_L1_SHIFT, _MED_FANOUT)
        host = {
            "med_cnt_hi": (l1 >> 15).astype(np.int32),
            "med_cnt_lo": (l1 & ((1 << 15) - 1)).astype(np.int32),
        }
        refine_calls = []

        def refine(lo_key, shift, nbins):
            refine_calls.append((lo_key, shift, nbins))
            return np_counts(keys, lo_key, shift, nbins)

        got = _exact_median_host(host, n, refine)
        want = float(np.median(np.tile(np.asarray(values, np.float32), n)))
        assert np.float32(got) == np.float32(want), (got, want, refine_calls)
        return refine_calls

    rng = np.random.default_rng(0)
    # dense common case: 5 sweeps resolve the single shared chain (the
    # second middle rank reuses every cached level)
    calls = run_case(
        np.sort((0.5 + rng.uniform(-4e-4, 4e-4, 101)).astype(np.float32))
    )
    assert 1 <= len(calls) <= 5
    # all-identical values: descent still lands on the exact pattern
    calls = run_case(np.full(51, 0.5, np.float32))
    assert len(calls) <= 5
    # split middle ranks: even count, two middles in far-apart ranges ->
    # two chains, each bounded by the 5-sweep descent
    calls = run_case(np.asarray([0.25] * 25 + [0.75] * 25, np.float32))
    assert len(calls) <= 10
    # denormal/zero-heavy values (exp underflow regime)
    tiny = (rng.uniform(0, 1, 64).astype(np.float32) * np.float32(1e-41))
    tiny[:20] = 0.0
    run_case(np.sort(tiny))

    # and the real device level pass agrees with the numpy counting oracle
    # on every (shift, nbins) the descent uses (width 2^25 -> shifts
    # 20/15/10/5/0 at 32 bins), over real similarity values
    feats = (rng.standard_normal((64, 4)) * 0.3).astype(np.float32)
    pos = rng.uniform(0, 2, (64, 2)).astype(np.float32)
    from multimodal_fusion_tpu.ops.similarity import combined_similarity

    K = np.asarray(combined_similarity(jnp.asarray(feats), jnp.asarray(pos), 1.0, 1.0))
    keys = K.reshape(-1).view(np.int32).astype(np.int64)
    med_key = int(np.sort(keys)[len(keys) // 2])
    for shift, nbins in [(20, 32), (15, 32), (10, 32), (5, 32), (0, 32)]:
        lo = (med_key >> (shift + 5)) << (shift + 5)  # enclosing range
        chi, clo = _median_level_pass(
            jnp.asarray(feats), jnp.asarray(pos), 1.0, 1.0,
            jnp.int32(64), jnp.int32(lo), jnp.int32(shift), nbins, False,
            block=16,
        )
        cnt_dev = np.asarray(chi).astype(np.int64) * (1 << 15) + np.asarray(clo)
        np.testing.assert_array_equal(cnt_dev, np_counts(keys, lo, shift, nbins))


def test_median_level_pass_padded_parities():
    """``_median_level_pass`` L1 counts vs the production-K numpy oracle
    across padded/valid-count parities (odd/even n_eff, n_eff == 1) — the
    padding masks must exclude exactly the invalid rows/columns whatever
    the parity of the valid count."""
    import jax.numpy as jnp

    from multimodal_fusion_tpu.hypergraph.build import (
        _MED_FANOUT,
        _MED_L1_SHIFT,
        _median_level_pass,
    )
    from multimodal_fusion_tpu.ops.similarity import combined_similarity

    rng = np.random.default_rng(3)
    for n, blk, n_eff in [(63, 16, 63), (64, 16, 47), (64, 16, 46), (40, 8, 1)]:
        feats = jnp.asarray(rng.standard_normal((n, 8)) * 0.3, jnp.float32)
        pos = jnp.asarray(rng.uniform(0, 2, (n, 2)), jnp.float32)
        K = np.asarray(combined_similarity(feats, pos, 1.0, 1.0))
        keys = K[:n_eff, :n_eff].reshape(-1).view(np.int32).astype(np.int64)
        chi, clo = _median_level_pass(
            feats, pos, 1.0, 1.0, jnp.int32(n_eff), jnp.int32(0),
            jnp.int32(_MED_L1_SHIFT), _MED_FANOUT, True, block=blk,
        )
        got = np.asarray(chi).astype(np.int64) * (1 << 15) + np.asarray(clo)
        idx = keys >> _MED_L1_SHIFT
        ok = (keys >= 0) & (idx < _MED_FANOUT)
        ref = np.bincount(idx[ok], minlength=_MED_FANOUT)[:_MED_FANOUT]
        np.testing.assert_array_equal(got, ref, err_msg=f"{n},{blk},{n_eff}")
        assert int(got.sum()) == n_eff * n_eff


def test_blockwise_pallas_stripe_route_self_consistent():
    """The use_pallas blockwise route (r5: kernel stripes instead of the
    XLA formulation — the XLA passes spend most of a sweep round-tripping
    materialised [B,N] intermediates through HBM) must be self-consistent:
    the stats-pass L1 histogram and the refine sweeps recompute bitwise-
    identical stripes (the loud ``_select_key`` cross-check passes), and
    the selected median equals ``jnp.median`` of the kernel-built full K
    bit for bit — kernel tile math is per-element, so values are
    independent of how rows split into stripes."""
    import jax.numpy as jnp

    from multimodal_fusion_tpu.hypergraph.build import (
        _attach_exact_median,
        _blockwise_similarity_stats,
    )
    from multimodal_fusion_tpu.ops.pallas_similarity import (
        pallas_combined_similarity,
    )

    rng = np.random.default_rng(7)
    n, blk, G = 150, 64, 5
    feats = jnp.asarray(rng.standard_normal((n, 16)) * 0.3, jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 2, (n, 2)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, G, n), jnp.int32)
    for bf16 in (False, True):
        f = feats
        if bf16:
            f = f.astype(jnp.bfloat16).astype(jnp.float32)
        K = pallas_combined_similarity(
            f, pos, 1.0, 1.0, interpret=True, bf16_exact=bf16
        )
        want = np.float32(np.asarray(jnp.median(K)))
        out = _blockwise_similarity_stats(
            f, pos, 1.0, 1.0, labels, G, jnp.int32(n), False, block=blk,
            bf16_exact=bf16, use_pallas=True,
        )
        tsum, tsumsq, tmn, tmx, s_cc, diag_c, (chi, clo) = out
        host = {"med_cnt_hi": np.asarray(chi), "med_cnt_lo": np.asarray(clo)}
        _attach_exact_median(
            host, n, f, pos, 1.0, 1.0, False, bf16_exact=bf16,
            use_pallas=True,
        )
        assert np.float32(host["exact_median"]) == want, bf16
        # float stats agree with the dense kernel K (exact reductions)
        Kn = np.asarray(K, np.float64)
        np.testing.assert_allclose(float(tsum), Kn.sum(), rtol=1e-5)
        assert np.float32(tmn) == np.float32(Kn.min())
        assert np.float32(tmx) == np.float32(Kn.max())


def test_exact_median_refine_mismatch_raises():
    """A refine pass whose totals disagree with the parent bin count must
    fail loudly (silent disagreement would select a wrong median)."""
    from multimodal_fusion_tpu.hypergraph.build import (
        _MED_FANOUT,
        _MED_L1_SHIFT,
        _exact_median_host,
    )

    keys = np.full(9, np.float32(0.5).view(np.int32), np.int64)  # 3x3 matrix
    idx = (keys >> _MED_L1_SHIFT).astype(np.int64)
    l1 = np.bincount(idx, minlength=_MED_FANOUT).astype(np.int64)
    host = {
        "med_cnt_hi": (l1 >> 15).astype(np.int32),
        "med_cnt_lo": (l1 & ((1 << 15) - 1)).astype(np.int32),
    }

    def bad_refine(lo_key, shift, nbins):
        return np.zeros(nbins, np.int64)  # drops every value

    with pytest.raises(RuntimeError, match="disagrees"):
        _exact_median_host(host, 3, bad_refine)


def test_bitpattern_median_matches_sort(rng):
    """Device median is bit-pattern bisection above the size threshold (43ms
    sort -> 0.8ms at [4096,4096] on v5e): assert exact agreement with
    jnp.median/np.median for odd/even counts, masks, and tie-heavy data."""
    import jax
    import jax.numpy as jnp

    from multimodal_fusion_tpu.hypergraph.build import _bitpattern_median

    for shape in [(317, 317), (300, 301), (513,)]:
        K = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32) ** 3)
        assert float(jax.jit(_bitpattern_median)(K)) == float(jnp.median(K))
        v = jnp.asarray(rng.uniform(size=shape) < 0.7)
        got = float(jax.jit(lambda K, v: _bitpattern_median(K, mask=v))(K, v))
        assert got == float(np.median(np.asarray(K)[np.asarray(v)]))
    # heavy ties (exact zeros/ones) and the all-invalid -> NaN contract
    K = jnp.asarray(rng.integers(0, 2, (101, 101)).astype(np.float32))
    assert float(jax.jit(_bitpattern_median)(K)) == float(jnp.median(K))
    K8 = jnp.ones((8, 8), jnp.float32)
    empty = jnp.zeros((8, 8), bool)
    assert np.isnan(
        float(jax.jit(lambda K, v: _bitpattern_median(K, mask=v))(K8, empty))
    )
    # denormal-heavy + exact-zero values (exp(-d) underflows at large
    # distances): bit patterns are tiny ints, bisection must still be exact
    tiny = rng.uniform(0, 1, (257, 257)).astype(np.float32) * np.float32(1e-41)
    tiny[rng.uniform(size=tiny.shape) < 0.3] = 0.0
    Kt = jnp.asarray(tiny)
    assert float(jax.jit(_bitpattern_median)(Kt)) == float(jnp.median(Kt))
