"""Legacy chunked-HP chain: stores, chunking, jitted dual-hap predictor,
and the bridge into the legacy HP candidate finder."""
import numpy as np
import pytest

from pepper_tpu.options import ImageOptionsHP
from pepper_tpu.pipelines.hp_legacy import (HPChunkedImageStore,
                                            HPPredictionStore,
                                            make_chunked_hp_images,
                                            make_hp_window_vote_fn,
                                            predict_hp,
                                            predictions_to_finder_inputs)


def test_chunked_image_store_roundtrip(tmp_path):
    path = str(tmp_path / "hp_images.hdf")
    img = np.random.randint(0, 255, (1000, 48), np.uint8)
    pos = np.arange(1000, dtype=np.int32)
    idx = np.zeros(1000, np.int32)
    with HPChunkedImageStore(path, "w") as store:
        store.write_summary_hp(("chr1", 0, 999), img, img, idx, idx, pos,
                               idx, 0, "chr1-0-999-0")
        # duplicate write is ignored (reference meta-set behavior)
        store.write_summary_hp(("chr1", 0, 999), img * 0, img, idx, idx,
                               pos, idx, 0, "chr1-0-999-0")
    with HPChunkedImageStore(path, "r") as store:
        assert store.summary_names() == ["chr1-0-999-0"]
        s = store.read_summary("chr1-0-999-0")
        np.testing.assert_array_equal(s["image_hp1"], img)
        assert s["contig"] == "chr1" and s["region_end"] == 999


def test_make_chunked_hp_images_masks_haplotypes():
    L = 2400
    matrix = np.ones((L, 48), np.int64)
    positions = np.arange(L)
    indices = np.zeros(L, np.int64)
    chunks = make_chunked_hp_images(matrix, positions, indices)
    # jump 950: starts at 0, 950, 1900 -> 3 chunks
    assert [c["chunk_id"] for c in chunks] == [0, 1, 2]
    c0 = chunks[0]
    assert c0["image_hp1"].shape == (1000, 48)
    assert c0["image_hp1"][:, 24:].sum() == 0  # HP2 block zeroed
    assert c0["image_hp2"][:, :24].sum() == 0  # HP1 block zeroed
    last = chunks[-1]
    valid = L - 1900
    assert (last["position"][:valid] == positions[1900:]).all()
    assert (last["position"][valid:] == -1).all()  # zero-padded tail


def _tiny_params(num_classes=5, features=48, hidden=8):
    import jax
    from pepper_tpu.models.polish_model import init_polish_params
    return init_polish_params(jax.random.PRNGKey(0),
                              image_features=features, hidden=hidden,
                              num_classes=num_classes)


def test_window_vote_fn_semantics():
    import jax.numpy as jnp
    params = _tiny_params()
    fn = make_hp_window_vote_fn(params, num_classes=5, seq_len=200,
                                window=100, jump=50, hidden_size=8)
    x1 = jnp.zeros((2, 200, 48))
    v1, v2 = fn(x1, x1)
    v1 = np.asarray(v1)
    assert v1.shape == (2, 200, 5)
    # interior positions covered by 2 windows -> vote sums ~2*10000;
    # edges by 1 window -> ~10000 (int truncation loses <=1 per class)
    inner = v1[:, 60:90].sum(axis=2)
    edge = v1[:, :40].sum(axis=2)
    assert ((inner > 19000) & (inner <= 20000)).all()
    assert ((edge > 9000) & (edge <= 10000)).all()
    # identical inputs, identical per-hap votes
    np.testing.assert_array_equal(v1, np.asarray(v2))


def test_predict_hp_end_to_end_with_finder(tmp_path):
    """Full legacy chain: chunked HP images -> predictor -> prediction
    store -> LegacyCandidateFinderHP inputs."""
    import jax

    from pepper_tpu.models.checkpoint import save_checkpoint

    image_dir = str(tmp_path / "images")
    import os
    os.makedirs(image_dir)
    L = ImageOptionsHP.SEQ_LENGTH
    rng = np.random.RandomState(0)
    matrix = rng.randint(0, 40, (L + 100, 48)).astype(np.int64)
    chunks = make_chunked_hp_images(matrix, np.arange(L + 100),
                                    np.zeros(L + 100, np.int64))
    with HPChunkedImageStore(os.path.join(image_dir, "im.hdf"),
                             "w") as store:
        for c in chunks:
            store.write_summary_hp(("chr1", 0, L + 99), c["image_hp1"],
                                   c["image_hp2"], c["index"], c["index"],
                                   c["position"], c["index"], c["chunk_id"],
                                   f"chr1-0-{L + 99}-{c['chunk_id']}")

    model_path = str(tmp_path / "hp_model.npz")
    save_checkpoint(model_path, _tiny_params(num_classes=5, hidden=8))

    out = predict_hp(image_dir, model_path,
                     str(tmp_path / "preds" / "p.hdf"), batch_size=4)
    with HPPredictionStore(out, "r") as store:
        recs = list(store.iter_predictions())
        assert len(recs) == len(chunks)
        assert recs[0]["base_predictions_hp1"].shape == (L, 5)
        positions, indices, h1, h2 = predictions_to_finder_inputs(store)
    # overlap de-dup: every genomic (pos, index) appears exactly once
    assert len(positions) == L + 100
    assert len(set(zip(positions, indices))) == len(positions)
    assert all(len(v) == 5 for v in h1) and len(h2) == len(h1)
    # finder accepts the bridge output
    from pepper_tpu.pipelines.candidate_finder_legacy import \
        LegacyCandidateFinderHP
    ref = "".join("ACGT"[i % 4] for i in range(200))
    finder = LegacyCandidateFinderHP(ref, "chr1", 0, 199, 0, 200)
    records = finder.find_candidates([], positions, indices, h1, h2)
    assert records == []  # no reads -> no alleles, but no crash
