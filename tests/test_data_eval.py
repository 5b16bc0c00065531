"""Data-pipeline and evaluator tests (synthetic / temp-file based)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from structure_knowledge_distillation_tpu.data import (
    CityscapesDataset,
    SyntheticSegDataset,
    batch_iterator,
    id2trainid,
    trainid2id,
)
from structure_knowledge_distillation_tpu.data.cityscapes import IMG_MEAN_BGR
from structure_knowledge_distillation_tpu.training.evaluate import (
    confusion_matrix,
    get_palette,
    iu_from_confusion,
    predict_multiscale,
    predict_sliding,
)


def test_trainid_lut():
    # reference datasets.py:146-151
    label = np.array([[7, 8, 33], [0, 6, 26]], np.uint8)
    mapped = id2trainid(label)
    np.testing.assert_array_equal(mapped, [[0, 1, 18], [255, 255, 13]])
    # reverse map for submission (ignore stays out of range by design)
    back = trainid2id(np.array([[0, 1, 18]], np.uint8))
    np.testing.assert_array_equal(back, [[7, 8, 33]])


def _write_fake_cityscapes(tmp_path, n=3, h=40, w=60):
    import cv2

    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        # labelIds in the raw 0..33 space
        lab = rng.integers(0, 34, (h, w)).astype(np.uint8)
        ip, lp = f"leftImg8bit/img_{i}.png", f"gtFine/lab_{i}.png"
        os.makedirs(os.path.dirname(tmp_path / ip), exist_ok=True)
        os.makedirs(os.path.dirname(tmp_path / lp), exist_ok=True)
        cv2.imwrite(str(tmp_path / ip), img)
        cv2.imwrite(str(tmp_path / lp), lab)
        lines.append(f"{ip}\t{lp}\n")
    lst = tmp_path / "train.lst"
    lst.write_text("".join(lines))
    return str(tmp_path), str(lst)


def test_cityscapes_dataset_augmentation(tmp_path):
    root, lst = _write_fake_cityscapes(tmp_path)
    ds = CityscapesDataset(root, lst, crop_size=(64, 64), scale=True, mirror=True, seed=3)
    image, label, size, name = ds[0]
    assert image.shape == (64, 64, 3) and image.dtype == np.float32
    assert label.shape == (64, 64) and label.dtype == np.int32
    # padded label regions use ignore; every label is a valid trainId or 255
    valid = set(np.unique(label).tolist())
    assert valid <= set(range(19)) | {255}
    # image padding is exactly 0 (post mean-subtraction), so pads are where
    # label == 255 beyond original content; at least check mean subtraction:
    ds_noscale = CityscapesDataset(root, lst, crop_size=(40, 60), scale=False,
                                   mirror=False, seed=3)
    img2, _, _, _ = ds_noscale[1]
    import cv2

    raw = cv2.imread(os.path.join(root, "leftImg8bit/img_1.png"))
    np.testing.assert_allclose(img2, raw.astype(np.float32) - IMG_MEAN_BGR, atol=1e-5)


def test_cityscapes_max_iters_repeats(tmp_path):
    root, lst = _write_fake_cityscapes(tmp_path)
    ds = CityscapesDataset(root, lst, max_iters=10, crop_size=(32, 32))
    assert len(ds) >= 10


def test_batch_iterator_shapes():
    ds = SyntheticSegDataset(length=7, crop_size=(16, 16), num_classes=5)
    batches = list(batch_iterator(ds, 2, shuffle=True, drop_last=True))
    assert len(batches) == 3
    images, labels, sizes, names = batches[0]
    assert images.shape == (2, 16, 16, 3)
    assert labels.shape == (2, 16, 16)
    assert len(names) == 2


def test_batch_iterator_process_shards_partition_each_global_batch():
    """Multi-host contract (batch_iterator num_shards/shard_index): every
    process draws the identical shuffled order and takes its contiguous
    slice, so the per-process batches concatenate EXACTLY to the unsharded
    global batch — the invariant jax.make_array_from_process_local_data
    assembly (data.prefetch.put_global) relies on."""
    import numpy as np
    import pytest

    ds = SyntheticSegDataset(length=12, crop_size=(8, 8), num_classes=5)
    global_batches = list(batch_iterator(ds, 4, shuffle=True, seed=7))
    shard_iters = [list(batch_iterator(ds, 4, shuffle=True, seed=7,
                                       num_shards=2, shard_index=i))
                   for i in range(2)]
    assert len(shard_iters[0]) == len(global_batches) == 3
    for g, s0, s1 in zip(global_batches, *shard_iters):
        assert s0[0].shape[0] == s1[0].shape[0] == 2  # local = global / 2
        np.testing.assert_array_equal(
            np.concatenate([s0[0], s1[0]]), g[0])  # images partition
        np.testing.assert_array_equal(
            np.concatenate([s0[1], s1[1]]), g[1])  # labels partition
        assert list(s0[3]) + list(s1[3]) == list(g[3])  # names too

    with pytest.raises(ValueError, match="divisible"):
        next(iter(batch_iterator(ds, 3, num_shards=2)))
    with pytest.raises(ValueError, match="drop_last"):
        next(iter(batch_iterator(ds, 4, num_shards=2, drop_last=False)))


def test_put_global_matches_device_put_single_process():
    """put_global is the placement used by device_prefetch and the trainer:
    in a single-controller process it must be exactly device_put (the
    multi-process branch follows jax.make_array_from_process_local_data's
    documented contract and needs real multi-host to execute)."""
    import jax
    import numpy as np

    from structure_knowledge_distillation_tpu.data import put_global
    from structure_knowledge_distillation_tpu.parallel import (
        batch_sharding,
        make_mesh,
    )

    mesh = make_mesh(num_data=4, num_model=1)
    sh = batch_sharding(mesh)
    x = np.arange(4 * 6, dtype=np.float32).reshape(4, 6)
    a = put_global(x, sh)
    b = jax.device_put(x, sh)
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sharding=None falls back to plain device_put
    np.testing.assert_array_equal(np.asarray(put_global(x, None)), x)


def test_confusion_matrix_matches_bincount_reference():
    rng = np.random.default_rng(1)
    c = 5
    gt = rng.integers(0, c, (37,))
    pred = rng.integers(0, c, (37,))
    ours = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), c))
    # reference evaluate.py:136-154
    index = (gt * c + pred).astype("int32")
    label_count = np.bincount(index, minlength=c * c)
    theirs = label_count.reshape(c, c)
    np.testing.assert_array_equal(ours, theirs)


def test_confusion_matrix_respects_ignore():
    c = 3
    gt = np.array([0, 1, 255, 2, 255])
    pred = np.array([0, 2, 1, 2, 0])
    conf = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), c))
    assert conf.sum() == 3
    assert conf[0, 0] == 1 and conf[1, 2] == 1 and conf[2, 2] == 1


def test_iu_formula():
    conf = np.array([[5.0, 1.0], [2.0, 8.0]])
    mean_iu, iu = iu_from_confusion(conf)
    # IU_c = tp / (pos + res - tp), reference evaluate.py:200-206
    np.testing.assert_allclose(iu[0], 5.0 / (6 + 7 - 5))
    np.testing.assert_allclose(iu[1], 8.0 / (10 + 9 - 8))
    np.testing.assert_allclose(mean_iu, iu.mean())


def test_predict_sliding_counts_normalize():
    classes = 4

    def fake_tile_predictor(tile):
        return np.ones((1, tile.shape[1], tile.shape[2], classes))

    image = np.zeros((1, 100, 140, 3), np.float32)
    probs = predict_sliding(fake_tile_predictor, image, (64, 64), classes)
    assert probs.shape == (100, 140, classes)
    np.testing.assert_allclose(probs, 1.0)


def test_predict_multiscale_flip_average():
    classes = 2
    calls = []

    def fake_whole(img):
        calls.append(img.shape)
        out = np.zeros((1, img.shape[1], img.shape[2], classes))
        out[..., 0] = np.arange(img.shape[2])[None, None, :]
        return out

    image = np.zeros((1, 8, 8, 3), np.float32)
    probs = predict_multiscale(fake_whole, image, scales=[1.0], flip=True)
    # flip-average of a horizontal ramp is constant (N-1)/2
    np.testing.assert_allclose(probs[..., 0], 3.5)
    assert len(calls) == 2


def test_palette_deterministic():
    pal = get_palette(256)
    assert len(pal) == 768
    assert pal[:6] == [0, 0, 0, 128, 0, 0]  # class 1 = maroon (PASCAL scheme)


def test_native_augment_matches_numpy_path(tmp_path):
    """The fused C++ kernel reproduces the numpy/cv2 reference pipeline:
    identical geometry (labels exact), pixel values within cv2's fixed-point
    tolerance."""
    import pytest as _pytest

    from structure_knowledge_distillation_tpu.data.native import get_native_lib

    if get_native_lib() is None:
        _pytest.skip("native lib unavailable")

    root, lst = _write_fake_cityscapes(tmp_path, n=2, h=50, w=70)
    for seed in (0, 1, 2, 5):
        ds_np = CityscapesDataset(root, lst, crop_size=(48, 48), scale=True,
                                  mirror=True, seed=seed, use_native=False)
        ds_nat = CityscapesDataset(root, lst, crop_size=(48, 48), scale=True,
                                   mirror=True, seed=seed, use_native=True)
        assert ds_nat.use_native
        img_a, lab_a, _, _ = ds_np[0]
        img_b, lab_b, _, _ = ds_nat[0]
        np.testing.assert_array_equal(lab_a, lab_b)
        np.testing.assert_allclose(img_a, img_b, atol=1.0)
        # pads (label==255 region beyond content) must be exactly zero in both
        assert img_b.dtype == np.float32 and lab_b.dtype == np.int32

    # randomized sweep: frame/crop geometries hitting scale-up, scale-down,
    # pad-both-dims, pad-one-dim, and crop-without-pad paths
    rng = np.random.default_rng(99)
    for case in range(8):
        h, w = int(rng.integers(20, 90)), int(rng.integers(20, 90))
        ch, cw = int(rng.integers(12, 64)), int(rng.integers(12, 64))
        seed = int(rng.integers(0, 1000))
        root, lst = _write_fake_cityscapes(tmp_path / f"sweep{case}", n=1,
                                           h=h, w=w)
        ds_np = CityscapesDataset(root, lst, crop_size=(ch, cw), scale=True,
                                  mirror=True, seed=seed, use_native=False)
        ds_nat = CityscapesDataset(root, lst, crop_size=(ch, cw), scale=True,
                                   mirror=True, seed=seed, use_native=True)
        img_a, lab_a, _, _ = ds_np[0]
        img_b, lab_b, _, _ = ds_nat[0]
        msg = f"frame {(h, w)} crop {(ch, cw)} seed {seed}"
        np.testing.assert_array_equal(lab_a, lab_b, err_msg=msg)
        np.testing.assert_allclose(img_a, img_b, atol=1.0, err_msg=msg)


def test_native_confusion_matches_jit():
    import pytest as _pytest

    from structure_knowledge_distillation_tpu.data.native import (
        get_native_lib, native_confusion,
    )

    if get_native_lib() is None:
        _pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 6, (500,)).astype(np.int32)
    gt[::7] = 255
    pred = rng.integers(0, 6, (500,)).astype(np.int32)
    ours = native_confusion(pred, gt, 6)
    ref = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), 6))
    np.testing.assert_array_equal(ours, ref.astype(np.int64))


def test_fast_val_path_matches_slow_path():
    """Device-side argmax+confusion (default val path) == the host path."""
    import jax
    from flax import linen as nn

    from structure_knowledge_distillation_tpu.ops import ABN
    from structure_knowledge_distillation_tpu.training.evaluate import evaluate_main

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(8, (4, 4), strides=(4, 4))(x)
            h = ABN(activation="leaky_relu")(h, not train)
            return (nn.Conv(5, (1, 1))(h), h)

    model = Tiny()
    rng = np.random.default_rng(0)
    img = rng.normal(0, 50, (1, 64, 64, 3)).astype(np.float32)
    lab = rng.integers(0, 5, (1, 64, 64)).astype(np.int32)
    lab[0, :3] = 255
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img), train=False)
    batch = [(img, lab, np.array([[64, 64, 3]]), ["x"])]

    fast = evaluate_main(model, variables, batch, 5, out_size=(64, 64),
                         eval_type="val", whole=True, scales=(1.0,), flip=False)
    slow = evaluate_main(model, variables, batch, 5, out_size=(64, 64),
                         eval_type="val", whole=True, scales=[1.0], flip=True)
    # flip=True forces the slow path; with a conv net the flip-average differs,
    # so compare the fast path against the slow path via sliding instead:
    slow2 = evaluate_main(model, variables, batch, 5, out_size=(64, 64),
                          eval_type="val", whole=False, tile_size=(64, 64))
    np.testing.assert_allclose(fast[0], slow2[0], rtol=1e-6)
    np.testing.assert_allclose(fast[1], slow2[1], rtol=1e-6)


def test_sliding_tiles_upsample_to_tile_size():
    """Sliding-window eval must upsample each tile's logits to TILE size
    (reference evaluate.py:71), not to the full output size. For a pointwise
    model the sliding reconstruction equals the whole-image path exactly —
    with multiple tiles per image (tile < image) this discriminates."""
    import jax
    from flax import linen as nn

    from structure_knowledge_distillation_tpu.training.evaluate import evaluate_main

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return (nn.Conv(5, (1, 1))(x), x)

    model = Tiny()
    rng = np.random.default_rng(3)
    img = rng.normal(0, 50, (1, 64, 64, 3)).astype(np.float32)
    lab = rng.integers(0, 5, (1, 64, 64)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img), train=False)
    batch = [(img, lab, np.array([[64, 64, 3]]), ["x"])]

    whole = evaluate_main(model, variables, batch, 5, out_size=(64, 64),
                          eval_type="val", whole=True)
    sliding = evaluate_main(model, variables, batch, 5, out_size=(64, 64),
                            eval_type="val", whole=False, tile_size=(32, 32))
    np.testing.assert_allclose(whole[0], sliding[0], rtol=1e-6)
    np.testing.assert_allclose(whole[1], sliding[1], rtol=1e-6)


def test_batch_iterator_reshuffles_each_epoch():
    """Per-epoch reshuffle like the reference DataLoader
    (train_and_eval.py:13-17)."""
    ds = SyntheticSegDataset(length=8, crop_size=(8, 8), num_classes=5)
    batches = list(batch_iterator(ds, 2, shuffle=True, seed=5, epochs=3))
    assert len(batches) == 12
    per_epoch = [tuple(n for b in batches[i * 4:(i + 1) * 4] for n in b[3])
                 for i in range(3)]
    # each epoch is a permutation of the full dataset...
    for names in per_epoch:
        assert len(set(names)) == 8
    # ...and consecutive epochs use different orders
    assert per_epoch[0] != per_epoch[1] or per_epoch[1] != per_epoch[2]


def test_fast_val_path_crops_to_size():
    """Padded rows/cols beyond `size` stay out of the confusion matrix even
    when the padding is NOT the ignore label (the slow path slices [:h,:w],
    reference evaluate.py:183-185)."""
    import jax
    from flax import linen as nn

    from structure_knowledge_distillation_tpu.training.evaluate import evaluate_main

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return (nn.Conv(5, (1, 1))(x), x)

    model = Tiny()
    rng = np.random.default_rng(2)
    img = rng.normal(0, 1, (1, 32, 32, 3)).astype(np.float32)
    lab = rng.integers(0, 5, (1, 32, 32)).astype(np.int32)
    lab[0, 20:, :] = 3  # pad rows labeled with a VALID class, size says h=20
    lab[0, :, 24:] = 2  # pad cols too, w=24
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img), train=False)
    batch = [(img, lab, np.array([[20, 24, 3]]), ["x"])]

    fast = evaluate_main(model, variables, batch, 5, out_size=(32, 32),
                         eval_type="val", whole=True, scales=(1.0,), flip=False)
    slow = evaluate_main(model, variables, batch, 5, out_size=(32, 32),
                         eval_type="val", whole=False, tile_size=(32, 32))
    np.testing.assert_allclose(fast[0], slow[0], rtol=1e-6)
    np.testing.assert_allclose(fast[1], slow[1], rtol=1e-6)


def test_make_voc_and_camvid_lists(tmp_path):
    from structure_knowledge_distillation_tpu.data.lists import (
        make_camvid_lists, make_voc_lists,
    )

    # --- VOC tree: ImageSets + Aug masks for 2 of 3 train ids
    voc = tmp_path / "voc"
    (voc / "ImageSets" / "Segmentation").mkdir(parents=True)
    (voc / "SegmentationClassAug").mkdir()
    (voc / "ImageSets" / "Segmentation" / "train.txt").write_text(
        "2007_000032\n2007_000039\n2007_000063\n")
    (voc / "ImageSets" / "Segmentation" / "val.txt").write_text("2007_000033\n")
    for i in ("2007_000032", "2007_000039", "2007_000033"):
        (voc / "SegmentationClassAug" / f"{i}.png").touch()
    written = make_voc_lists(str(voc))
    assert set(written) == {"train", "val"}
    assert written["train"].endswith("train_aug.txt")
    assert open(written["train"]).read().split() == ["2007_000032", "2007_000039"]
    assert open(written["val"]).read().split() == ["2007_000033"]

    # --- CamVid SegNet-style tree
    cam = tmp_path / "camvid"
    for split in ("train", "val"):
        (cam / split).mkdir(parents=True)
        (cam / (split + "annot")).mkdir()
        for i in range(2):
            (cam / split / f"{split}_{i}.png").touch()
            (cam / (split + "annot") / f"{split}_{i}.png").touch()
    written = make_camvid_lists(str(cam))
    assert set(written) == {"train", "val"}
    lines = open(written["train"]).read().splitlines()
    assert lines == [f"train/train_{i}.png\ttrainannot/train_{i}.png"
                     for i in range(2)]


def test_decode_cache_roundtrip(tmp_path):
    """cache_dir: first read decodes + writes .npy, second read mmaps the
    same pixels; augmented samples are identical for identical rng state."""
    root, lst = _write_fake_cityscapes(tmp_path)
    cache = str(tmp_path / "cache")
    ds_a = CityscapesDataset(root, lst, crop_size=(32, 32), seed=7)
    ds_b = CityscapesDataset(root, lst, crop_size=(32, 32), seed=7,
                             cache_dir=cache)
    a0 = ds_a[0]
    b0 = ds_b[0]  # decodes + fills cache
    np.testing.assert_array_equal(a0[0], b0[0])
    np.testing.assert_array_equal(a0[1], b0[1])
    import os as _os
    assert len([f for f in _os.listdir(cache) if f.endswith(".npy")]) == 2
    # fresh dataset, warm cache: mmap path produces the same sample
    ds_c = CityscapesDataset(root, lst, crop_size=(32, 32), seed=7,
                             cache_dir=cache)
    c0 = ds_c[0]
    np.testing.assert_array_equal(a0[0], c0[0])
    np.testing.assert_array_equal(a0[1], c0[1])


def test_batch_iterator_workers():
    """num_workers > 0 yields complete, well-shaped batches (worker-process
    decode; the torch-DataLoader counterpart, train_and_eval.py:13-15)."""
    ds = SyntheticSegDataset(length=8, crop_size=(8, 8), num_classes=5)
    batches = list(batch_iterator(ds, 2, shuffle=True, seed=1, num_workers=2))
    assert len(batches) == 4
    names = [n for b in batches for n in b[3]]
    assert len(set(names)) == 8
    assert batches[0][0].shape == (2, 8, 8, 3)


def test_evaluate_sharded_matches_unsharded():
    """evaluate_sharded over an 8-device data mesh (batched forward, device
    all-reduced confusion, padded tail group masked via h=w=0) must reproduce
    evaluate_main's batch-1 fast path exactly."""
    import jax
    from flax import linen as nn

    from structure_knowledge_distillation_tpu.ops import ABN
    from structure_knowledge_distillation_tpu.parallel import (
        batch_sharding, make_mesh,
    )
    from structure_knowledge_distillation_tpu.training.evaluate import (
        evaluate_main, evaluate_sharded,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(8, (4, 4), strides=(4, 4))(x)
            h = ABN(activation="leaky_relu")(h, not train)
            return (nn.Conv(5, (1, 1))(h), h)

    model = Tiny()
    rng = np.random.default_rng(3)
    # 5 images: one full group of 4 + a padded tail of 1
    items = []
    for i in range(5):
        img = rng.normal(0, 50, (1, 64, 64, 3)).astype(np.float32)
        lab = rng.integers(0, 5, (1, 64, 64)).astype(np.int32)
        lab[0, :3] = 255
        # ragged true sizes exercise the per-image crop mask
        items.append((img, lab, np.array([[60 - i, 64 - i, 3]]), [f"i{i}"]))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(items[0][0]),
                           train=False)

    ref_iu, ref_arr = evaluate_main(model, variables, items, 5,
                                    out_size=(64, 64), eval_type="val")

    mesh = make_mesh(num_data=4, num_model=2)
    iu, arr = evaluate_sharded(model, variables, items, 5, out_size=(64, 64),
                               batch=4, sharding=batch_sharding(mesh))
    np.testing.assert_allclose(iu, ref_iu, rtol=1e-6)
    np.testing.assert_allclose(arr, ref_arr, rtol=1e-6)


def test_evaluate_sharded_msf_matches_unsharded():
    """evaluate_sharded with scales/flip (batched fused msf program, data
    mesh, device all-reduced confusion) must reproduce evaluate_main's
    batch-1 device msf path."""
    import jax
    from flax import linen as nn

    from structure_knowledge_distillation_tpu.ops import ABN
    from structure_knowledge_distillation_tpu.parallel import (
        batch_sharding, make_mesh,
    )
    from structure_knowledge_distillation_tpu.training.evaluate import (
        evaluate_main, evaluate_sharded,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(8, (4, 4), strides=(4, 4))(x)
            h = ABN(activation="leaky_relu")(h, not train)
            return (nn.Conv(5, (1, 1))(h), h)

    model = Tiny()
    rng = np.random.default_rng(17)
    items = []
    for i in range(5):  # one full group of 4 + padded tail of 1
        img = rng.normal(0, 50, (1, 64, 64, 3)).astype(np.float32)
        lab = rng.integers(0, 5, (1, 64, 64)).astype(np.int32)
        lab[0, :2] = 255
        items.append((img, lab, np.array([[60 - i, 64 - i, 3]]), [f"m{i}"]))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(items[0][0]),
                           train=False)

    scales, flip = (0.5, 1.0), True
    ref_iu, ref_arr = evaluate_main(model, variables, items, 5,
                                    out_size=(64, 64), eval_type="val",
                                    scales=scales, flip=flip)

    mesh = make_mesh(num_data=4, num_model=2)
    iu, arr = evaluate_sharded(model, variables, items, 5, out_size=(64, 64),
                               batch=4, sharding=batch_sharding(mesh),
                               scales=scales, flip=flip)
    np.testing.assert_allclose(iu, ref_iu, rtol=1e-6)
    np.testing.assert_allclose(arr, ref_arr, rtol=1e-6)


def test_narrow_wire_format_is_lossless():
    """cast_batches' bf16-image / uint8-label wire format must be exactly
    equivalent on device: the bf16 model casts f32 inputs to bf16 as its
    first op anyway, and the losses widen labels back to int32."""
    import jax
    import ml_dtypes

    from structure_knowledge_distillation_tpu.data import cast_batches
    from structure_knowledge_distillation_tpu.losses import cross_entropy_ignore
    from structure_knowledge_distillation_tpu.models import ResPSPNet

    rng = np.random.default_rng(0)
    img = rng.normal(0, 60, (1, 64, 64, 3)).astype(np.float32)
    lab = rng.integers(0, 7, (1, 64, 64)).astype(np.int32)
    lab[0, :5] = 255

    [(img_n, lab_n)] = list(cast_batches([(img, lab)], ml_dtypes.bfloat16,
                                         "uint8"))
    assert img_n.dtype == ml_dtypes.bfloat16 and lab_n.dtype == np.uint8

    model = ResPSPNet(block="basic", layers=(1, 1, 1, 1), num_classes=7,
                      dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img), train=False)
    ref = model.apply(variables, jnp.asarray(img), train=False)[0]
    got = model.apply(variables, jnp.asarray(img_n), train=False)[0]
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(got, np.float32))

    logits = jnp.asarray(rng.normal(size=(1, 64, 64, 7)).astype(np.float32))
    ce_ref = float(cross_entropy_ignore(logits, jnp.asarray(lab)))
    ce_got = float(cross_entropy_ignore(logits, jnp.asarray(lab_n)))
    assert ce_ref == ce_got


def test_u8_wire_roundtrip_exact_for_unpadded_crops():
    """u8 wire: host re-quantizes (x + mean) to the original byte; the train
    step's device-side de-quantization (u8 - mean in f32) must reproduce the
    f32 path EXACTLY for crops without pad pixels."""
    from structure_knowledge_distillation_tpu.data import cast_batches

    mean = np.array((104.00698793, 116.66876762, 122.67891434), np.float32)
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.float32)
    img = raw - mean  # what the augmentation pipeline emits
    lab = rng.integers(0, 19, (2, 16, 16)).astype(np.int32)

    [(img_u8, lab_u8)] = list(cast_batches([(img, lab)], "uint8", "uint8",
                                           image_mean=mean))
    assert img_u8.dtype == np.uint8
    np.testing.assert_array_equal(img_u8, raw.astype(np.uint8))
    # device-side dequant (train_step.py): u8 -> f32 - mean == original
    dequant = img_u8.astype(np.float32) - mean
    np.testing.assert_array_equal(dequant, img)


def test_u8_eval_wire_matches_f32():
    """evaluate_main/evaluate_sharded with input_mean (u8 image wire +
    device dequant + u8 labels) must reproduce the f32-wire result exactly
    on integer−mean val frames."""
    import jax
    from flax import linen as nn

    from structure_knowledge_distillation_tpu.ops import ABN
    from structure_knowledge_distillation_tpu.parallel import (
        batch_sharding, make_mesh,
    )
    from structure_knowledge_distillation_tpu.training.evaluate import (
        evaluate_main, evaluate_sharded,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(8, (4, 4), strides=(4, 4))(x)
            h = ABN(activation="leaky_relu")(h, not train)
            return (nn.Conv(5, (1, 1))(h), h)

    mean = np.array((104.00698793, 116.66876762, 122.67891434), np.float32)
    rng = np.random.default_rng(7)
    items = []
    for i in range(3):
        raw = rng.integers(0, 256, (1, 64, 64, 3)).astype(np.float32)
        lab = rng.integers(0, 5, (1, 64, 64)).astype(np.int32)
        items.append((raw - mean, lab, np.array([[64, 64, 3]]), [f"v{i}"]))
    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(items[0][0]),
                           train=False)

    ref = evaluate_main(model, variables, items, 5, out_size=(64, 64),
                        eval_type="val")
    got = evaluate_main(model, variables, items, 5, out_size=(64, 64),
                        eval_type="val", input_mean=mean)
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))

    mesh = make_mesh(num_data=2, num_model=1)
    got_sh = evaluate_sharded(model, variables, items, 5, out_size=(64, 64),
                              batch=2, sharding=batch_sharding(mesh),
                              input_mean=mean)
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got_sh[1]))


def test_device_msf_path_matches_host_multiscale():
    """The fused on-device multiscale+flip program (one jit: per-scale input
    resize, forwards, flip average, cross-scale sum, argmax, confusion) must
    reproduce the reference-shaped host path (scipy-zoomed inputs,
    per-scale logits pulled back, numpy argmax)."""
    import jax
    from flax import linen as nn
    from scipy import ndimage

    from structure_knowledge_distillation_tpu.ops import ABN
    from structure_knowledge_distillation_tpu.ops.resize import (
        resize_bilinear_align_corners,
    )
    from structure_knowledge_distillation_tpu.training.evaluate import (
        confusion_matrix, evaluate_main, iu_from_confusion, make_predictor,
        predict_multiscale,
    )

    # scipy zoom(order=1, prefilter=False) == align-corners bilinear
    rng = np.random.default_rng(11)
    img = rng.normal(0, 50, (1, 64, 64, 3)).astype(np.float32)
    for s in (0.5, 1.5):
        ref = ndimage.zoom(img, (1.0, s, s, 1.0), order=1, prefilter=False)
        got = np.asarray(resize_bilinear_align_corners(
            jnp.asarray(img), (int(round(64 * s)), int(round(64 * s)))))
        assert ref.shape == got.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(8, (4, 4), strides=(4, 4))(x)
            h = ABN(activation="leaky_relu")(h, not train)
            return (nn.Conv(5, (1, 1))(h), h)

    model = Tiny()
    lab = rng.integers(0, 5, (1, 64, 64)).astype(np.int32)
    lab[0, :3] = 255
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img), train=False)
    items = [(img, lab, np.array([[64, 64, 3]]), ["m0"])]

    scales, flip = (0.5, 1.0, 1.5), True
    # host path (reference predict_multiscale shape)
    predictor = make_predictor(model, (64, 64))
    logits = predict_multiscale(
        lambda im: predictor(variables, jnp.asarray(im)), img, scales, flip)
    seg = np.argmax(logits, axis=2).astype(np.uint8)
    ref_iu, _ = iu_from_confusion(np.asarray(confusion_matrix(
        jnp.asarray(seg), jnp.asarray(lab[0]), 5)))

    got_iu, _ = evaluate_main(model, variables, items, 5, out_size=(64, 64),
                              eval_type="val", whole=True, scales=scales,
                              flip=flip)
    np.testing.assert_allclose(got_iu, ref_iu, atol=5e-3)


def test_device_sliding_matches_host_sliding():
    """The fused on-device sliding program (static tile grid, overlap
    accumulation, argmax, confusion in one jit) must reproduce the host
    predict_sliding path tile-for-tile — including the edge-shifted
    overlapping tiles and the pad branch when the image is smaller than a
    tile."""
    import jax
    from flax import linen as nn

    from structure_knowledge_distillation_tpu.ops import ABN
    from structure_knowledge_distillation_tpu.training.evaluate import (
        confusion_matrix, evaluate_main, iu_from_confusion, make_predictor,
        predict_sliding,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(8, (4, 4), strides=(4, 4))(x)
            h = ABN(activation="leaky_relu")(h, not train)
            return (nn.Conv(5, (1, 1))(h), h)

    model = Tiny()
    rng = np.random.default_rng(13)
    for out_size, tile in (((64, 96), (48, 48)),   # 2x3 overlapping grid
                           ((40, 40), (48, 48))):  # image < tile: pad branch
        img = rng.normal(0, 50, (1, *out_size, 3)).astype(np.float32)
        lab = rng.integers(0, 5, (1, *out_size)).astype(np.int32)
        lab[0, :3] = 255
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                               train=False)
        items = [(img, lab, np.array([[*out_size, 3]]), ["s0"])]

        tile_predictor = make_predictor(model, tile)
        logits = predict_sliding(
            lambda im: tile_predictor(variables, jnp.asarray(im)),
            img, tile, 5)
        seg = np.argmax(logits, axis=2).astype(np.uint8)
        ref_iu, _ = iu_from_confusion(np.asarray(confusion_matrix(
            jnp.asarray(seg), jnp.asarray(lab[0]), 5)))

        got_iu, _ = evaluate_main(model, variables, items, 5,
                                  out_size=out_size, eval_type="val",
                                  whole=False, tile_size=tile)
        np.testing.assert_allclose(got_iu, ref_iu, atol=1e-6)


def test_evaluate_spatial_matches_unsharded():
    """Height-sharded whole-image eval (XLA partitions the convs and inserts
    the 3x3 halo exchanges) must reproduce the unsharded fast path exactly —
    the TPU-native replacement for memory-bounded tiled inference."""
    import jax
    from flax import linen as nn

    from structure_knowledge_distillation_tpu.ops import ABN
    from structure_knowledge_distillation_tpu.parallel import make_mesh
    from structure_knowledge_distillation_tpu.training.evaluate import (
        evaluate_main, evaluate_spatial,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(8, (3, 3))(x)  # 3x3: exercises the halo exchange
            h = ABN(activation="leaky_relu")(h, not train)
            h = nn.Conv(8, (4, 4), strides=(4, 4))(h)
            return (nn.Conv(5, (1, 1))(h), h)

    model = Tiny()
    rng = np.random.default_rng(17)
    items = []
    for i in range(2):
        img = rng.normal(0, 50, (1, 64, 64, 3)).astype(np.float32)
        lab = rng.integers(0, 5, (1, 64, 64)).astype(np.int32)
        lab[0, :3] = 255
        items.append((img, lab, np.array([[60, 64, 3]]), [f"p{i}"]))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(items[0][0]),
                           train=False)

    ref_iu, ref_arr = evaluate_main(model, variables, items, 5,
                                    out_size=(64, 64), eval_type="val")
    mesh = make_mesh(num_data=4, num_model=1)
    iu, arr = evaluate_spatial(model, variables, items, 5, out_size=(64, 64),
                               mesh=mesh)
    np.testing.assert_allclose(iu, ref_iu, rtol=1e-6)
    np.testing.assert_allclose(arr, ref_arr, rtol=1e-6)
