"""Training-stack tests: loss parity vs torch, train convergence on the
synthetic dataset, multi-chip dry run on the virtual CPU mesh."""
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pepper_tpu.train.variant_train import (ReduceLROnPlateau,
                                            confusion_and_accuracy,
                                            cross_entropy_sum, train)


def test_cross_entropy_sum_matches_torch():
    logits = np.random.RandomState(0).randn(8, 3).astype(np.float32)
    labels = np.array([0, 1, 2, 0, 1, 2, 0, 1])
    want = torch.nn.CrossEntropyLoss(reduction="sum")(
        torch.tensor(logits), torch.tensor(labels)).item()
    got = float(cross_entropy_sum(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(want - got) < 1e-4


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(lr=1e-4, patience=2, min_lr=0.75e-4)
    assert s.step(50.0) == 1e-4          # improvement
    assert s.step(49.0) == 1e-4          # bad 1
    assert s.step(49.0) == 1e-4          # bad 2
    lr = s.step(49.0)                    # bad 3 > patience -> reduce, clamped
    assert lr == pytest.approx(0.75e-4)


def test_dryrun_multichip_8_devices():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__
    assert len(jax.devices()) >= 8
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 3)


@pytest.mark.slow
def test_train_learns_synthetic(tmp_path):
    """Train on oracle-labeled synthetic images; accuracy should beat chance."""
    from pepper_tpu.options import PipelineConfig
    from pepper_tpu.pipelines.make_images import generate_images
    from pepper_tpu.presets import set_parameters
    from tests.util.synth import (plant_variants, random_genome,
                                  simulate_reads, write_dataset,
                                  write_truth_vcf)
    tmp = str(tmp_path)
    genome = random_genome(30000, seed=41)
    variants = plant_variants(dict(genome), 10, 4, 4, seed=43)
    records = simulate_reads(genome, variants, coverage=30, seed=47,
                             error_rate=0.03)
    fasta, bam = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(tmp + "/truth.vcf", genome, variants)
    config = set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, output_dir=tmp, sub_command="make_train_images",
        ont_r9_guppy5_sup=True, threads=1, train_mode=True, truth_vcf=truth,
        random_draw_probability=1.0,
        image_output_directory=tmp + "/train_images/"))
    generate_images(config)

    model_path = train(tmp + "/train_images/", tmp + "/train_images/",
                       tmp + "/models/", batch_size=16, epoch_limit=4,
                       step_size=20, lr=2e-4)
    assert os.path.isfile(model_path)
    from pepper_tpu.models.checkpoint import load_checkpoint
    from pepper_tpu.runtime.inference import load_all_summaries
    params, meta = load_checkpoint(model_path)
    data = load_all_summaries(tmp + "/train_images/", train_mode=True)
    _, accuracy = confusion_and_accuracy(
        jax.tree_util.tree_map(jnp.asarray, params), data["images"],
        data["type_label"].astype(np.int64))
    # 3-class problem dominated by hom-ref; learned model must beat the
    # majority-class baseline
    majority = 100.0 * np.bincount(data["type_label"]).max() / len(data["images"])
    assert accuracy >= majority, (accuracy, majority)


def test_opt_state_checkpoint_roundtrip(tmp_path):
    """Optimizer state save/restore (reference 'model_optimizer',
    ModelHander.py:5-59): Adam moments + step count survive a checkpoint."""
    import optax
    from pepper_tpu.models.checkpoint import (load_opt_state,
                                              save_checkpoint)
    from pepper_tpu.models.variant_model import init_variant_params
    from pepper_tpu.train.variant_train import make_optimizer

    params = init_variant_params(jax.random.PRNGKey(0), hidden=8)
    optimizer = make_optimizer(1e-6)
    opt_state = optimizer.init(params)
    opt_state.hyperparams["learning_rate"] = jnp.asarray(3e-4)
    # advance the state so moments are non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, jax.tree_util.tree_map(np.asarray, params),
                    {"epochs": 2},
                    opt_state=jax.tree_util.tree_map(np.asarray, opt_state))
    template = optimizer.init(params)
    restored = load_opt_state(path, template)
    assert restored is not None
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # a params-only checkpoint yields None (graceful fresh optimizer)
    save_checkpoint(str(tmp_path / "plain.npz"),
                    jax.tree_util.tree_map(np.asarray, params), {})
    assert load_opt_state(str(tmp_path / "plain.npz"), template) is None


@pytest.mark.slow
def test_train_writes_stats_and_resumes_optimizer(tmp_path):
    """train() writes run-stamped loss CSVs + confusion matrix and a
    checkpoint that restores optimizer state on --retrain_model_path."""
    import glob as _glob

    from pepper_tpu.options import PipelineConfig
    from pepper_tpu.pipelines.make_images import generate_images
    from pepper_tpu.presets import set_parameters
    from tests.util.synth import (plant_variants, random_genome,
                                  simulate_reads, write_dataset,
                                  write_truth_vcf)
    tmp = str(tmp_path)
    genome = random_genome(20000, seed=81)
    variants = plant_variants(dict(genome), 8, 2, 2, seed=82)
    records = simulate_reads(genome, variants, coverage=25, seed=83,
                             error_rate=0.02)
    fasta, bam = write_dataset(tmp, genome, records)
    truth = write_truth_vcf(tmp + "/truth.vcf", genome, variants)
    config = set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, output_dir=tmp, sub_command="make_train_images",
        ont_r9_guppy5_sup=True, threads=1, train_mode=True, truth_vcf=truth,
        random_draw_probability=1.0,
        image_output_directory=tmp + "/imgs/"))
    generate_images(config)

    model_path = train(tmp + "/imgs/", tmp + "/imgs/", tmp + "/m1/",
                       batch_size=16, epoch_limit=1, step_size=5, lr=2e-4)
    stats = _glob.glob(tmp + "/m1/stats_*")
    assert len(stats) == 1
    for name in ("train_loss.csv", "test_loss.csv", "confusion_matrix.txt"):
        p = os.path.join(stats[0], name)
        assert os.path.getsize(p) > 0, name
    line = open(os.path.join(stats[0], "train_loss.csv")).readline().split(",")
    assert len(line) == 3 and float(line[2]) > 0

    # checkpoint carries optimizer state; retrain restores it
    import numpy as _np
    with _np.load(model_path) as z:
        assert any(k.startswith("__opt__/") for k in z.files)
    model2 = train(tmp + "/imgs/", tmp + "/imgs/", tmp + "/m2/",
                   batch_size=16, epoch_limit=1, step_size=5, lr=2e-4,
                   retrain_model_path=model_path)
    assert os.path.isfile(model2)


def _write_image_store(path, images, labels, per_summary=7):
    """Write labeled images across several summary groups."""
    from pepper_tpu.encode.region_encoder import CandidateBatch
    from pepper_tpu.pipelines.datastore import ImageStore
    with ImageStore(path, "w") as store:
        for si, lo in enumerate(range(0, len(images), per_summary)):
            img = images[lo:lo + per_summary]
            lab = labels[lo:lo + per_summary]
            n = len(img)
            store.write_summary(f"s{si}", CandidateBatch(
                "c1", np.arange(lo, lo + n), np.full(n, 30, np.int32),
                ["1A"] * n, np.full(n, 10, np.int32), img,
                np.zeros(n, np.int32), lab.astype(np.int32)),
                train_mode=True)


def test_shuffle_loader_eager_matches_legacy(tmp_path):
    """Dataset fits the buffer -> batches identical to the legacy eager
    permutation flow (same rng consumption, same order)."""
    from pepper_tpu.train.dataloader import ShuffleBufferLoader

    rng0 = np.random.RandomState(7)
    images = rng0.randint(-125, 126, (53, 33, 26)).astype(np.int8)
    labels = rng0.randint(0, 3, 53)
    path = str(tmp_path / "imgs.h5")
    _write_image_store(path, images, labels)

    loader = ShuffleBufferLoader([path], batch_size=8)
    assert loader.n_examples == 53
    assert loader.eager_arrays() is not None
    ex, ey = loader.eager_arrays()
    np.testing.assert_array_equal(ex, images)
    np.testing.assert_array_equal(ey, labels)

    # legacy: order = rng.permutation(n); slices of B; remainder dropped
    got = list(loader.epoch_batches(np.random.RandomState(3)))
    order = np.random.RandomState(3).permutation(53)
    assert len(got) == 53 // 8
    for i, (bx, by) in enumerate(got):
        idx = order[i * 8:(i + 1) * 8]
        np.testing.assert_array_equal(bx, images[idx])
        np.testing.assert_array_equal(by, labels[idx])


def test_shuffle_loader_streaming_covers_every_example(tmp_path):
    """Dataset larger than the buffer: streaming path emits every example
    exactly once per epoch (minus the dropped sub-batch tail), within the
    RAM budget."""
    from pepper_tpu.train.dataloader import ShuffleBufferLoader

    rng0 = np.random.RandomState(11)
    n = 500
    images = rng0.randint(-125, 126, (n, 33, 26)).astype(np.int8)
    # label encodes the example id (mod 3 classes not needed here)
    labels = np.arange(n) % 3
    path = str(tmp_path / "imgs.h5")
    _write_image_store(path, images, labels, per_summary=37)

    loader = ShuffleBufferLoader([path], batch_size=16,
                                 buffer_bytes=64 * (33 * 26 + 8))
    assert loader.eager_arrays() is None, "must take the streaming path"
    assert loader.buffer_examples < n

    seen = []
    for bx, by in loader.epoch_batches(np.random.RandomState(5)):
        assert bx.shape == (16, 33, 26)
        # identify examples by content (first row is unique with high prob)
        seen.extend(bx[:, 0, :].tobytes()[i * 26:(i + 1) * 26]
                    for i in range(len(bx)))
    n_emitted = len(seen)
    assert n - 16 < n_emitted <= n            # only the tail may drop
    assert len(set(seen)) == n_emitted, "an example was emitted twice"

    # two epochs with different rng differ in order
    b1 = next(iter(loader.epoch_batches(np.random.RandomState(5))))
    b2 = next(iter(loader.epoch_batches(np.random.RandomState(6))))
    assert not np.array_equal(b1[0], b2[0])


def test_train_streaming_loader_loss_trajectory(tmp_path):
    """train() with a buffer too small for the dataset still converges and
    runs the same number of steps; with a large buffer the loss CSV is
    identical to a second large-buffer run (determinism)."""
    from pepper_tpu.train.variant_train import train as vtrain

    rng0 = np.random.RandomState(13)
    images = rng0.randint(-125, 126, (120, 33, 26)).astype(np.int8)
    labels = rng0.randint(0, 3, 120)
    path = str(tmp_path / "imgs.h5")
    _write_image_store(path, images, labels, per_summary=17)

    def run(tag, buffer_bytes):
        out = str(tmp_path / tag)
        vtrain([path], [path], out, batch_size=16, epoch_limit=2,
               step_size=10, lr=1e-4, seed=9, buffer_bytes=buffer_bytes)
        import glob
        csv = glob.glob(out + "/stats_*/train_loss.csv")[0]
        with open(csv) as fh:
            return fh.read()

    big1 = run("big1", 512 << 20)
    big2 = run("big2", 512 << 20)
    small = run("small", 40 * (33 * 26 + 8))
    assert big1 == big2, "eager path must be deterministic"
    assert len(small.splitlines()) == len(big1.splitlines()), \
        "streaming path must run the same number of steps"
