"""Dataset sources: raw uint8 images + labels, indexable for sharded sampling.

Counterpart of the reference's torchvision-backed ``DatasetBuilder.build_dataset``
(reference dataset/datasets.py:86-124) for an air-gapped TPU host: CIFAR reads
the standard python-pickle archives from disk, everything else (imagenet,
flowers, caltech256, stanford_cars) reads an ImageFolder-style directory tree
via PIL with a thread pool, and ``synthetic`` generates deterministic data for
benchmarks/smoke tests. Sources return *raw* pixels — all augmentation happens
on device (see data/augment.py).

Folder images are standardized on the host to a fixed raw canvas
(shorter-side resize to ``raw_size`` + center crop) so batches have static
shapes; the on-device RandomResizedCrop then samples from that canvas. This is
the one host-side resample (the standard TPU input-pipeline trade; noted vs the
reference which crops the original).
"""

from __future__ import annotations

import os
import pickle
import tarfile
from concurrent.futures import ThreadPoolExecutor
from typing import List, Sequence, Tuple

import numpy as np

from deltakd_tpu.data.registry import DATASET_STATS

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm")


class ArraySource:
    """In-memory uint8 images [N, H, W, 3] + int labels [N]."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, num_classes: int):
        assert images.dtype == np.uint8 and images.ndim == 4
        self.images = images
        self.labels = np.asarray(labels, np.int32)
        self.num_classes = num_classes

    def __len__(self) -> int:
        return len(self.images)

    @property
    def raw_hw(self) -> Tuple[int, int]:
        return self.images.shape[1], self.images.shape[2]

    def get_batch(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        return self.images[indices], self.labels[indices]


def synthetic_source(n: int = 2048, hw: int = 32, num_classes: int = 100,
                     seed: int = 0) -> ArraySource:
    g = np.random.default_rng(seed)
    images = g.integers(0, 256, (n, hw, hw, 3), dtype=np.uint8)
    labels = g.integers(0, num_classes, (n,), dtype=np.int32)
    return ArraySource(images, labels, num_classes)


def _load_cifar_pickles(paths: Sequence[str], label_key: str
                        ) -> Tuple[np.ndarray, np.ndarray]:
    xs, ys = [], []
    for p in paths:
        with open(p, "rb") as f:
            d = pickle.load(f, encoding="latin1")
        xs.append(np.asarray(d["data"], np.uint8))
        ys.append(np.asarray(d[label_key], np.int32))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(x), np.concatenate(ys)


def cifar_source(root: str, dataset: str, is_train: bool) -> ArraySource:
    """Read the standard CIFAR python archives (same files torchvision
    downloads: cifar-100-python/, cifar-10-batches-py/, or their .tar.gz)."""
    if dataset == "cifar-100":
        subdir, label_key = "cifar-100-python", "fine_labels"
        files = ["train"] if is_train else ["test"]
    else:
        subdir, label_key = "cifar-10-batches-py", "labels"
        files = ([f"data_batch_{i}" for i in range(1, 6)] if is_train
                 else ["test_batch"])
    base = os.path.join(root, subdir)
    if not os.path.isdir(base):
        tar = base + ".tar.gz" if os.path.exists(base + ".tar.gz") else os.path.join(
            root, {"cifar-100": "cifar-100-python.tar.gz",
                   "cifar-10": "cifar-10-python.tar.gz"}[dataset])
        if os.path.exists(tar):
            with tarfile.open(tar) as tf:
                tf.extractall(root)
        else:
            raise FileNotFoundError(
                f"CIFAR archive not found under {root} (expected {subdir}/ or "
                f"its .tar.gz — place the standard archive there; this host "
                f"has no network access)")
    x, y = _load_cifar_pickles([os.path.join(base, f) for f in files], label_key)
    return ArraySource(x, y, DATASET_STATS[dataset]["num_classes"])


class FileListSource:
    """Lazily-decoded image files from an explicit (path, label) list.

    Decodes with a thread pool; each image is standardized to a fixed
    ``raw_size`` square canvas (shorter-side resize + center crop, bilinear).
    """

    def __init__(self, samples: List[Tuple[str, int]], num_classes: int,
                 raw_size: int = 256, num_workers: int = 8):
        from PIL import Image  # noqa: F401  (fail early if PIL missing)

        if not samples:
            raise FileNotFoundError("empty sample list")
        self.samples = samples
        self.num_classes = num_classes
        self.raw_size = raw_size
        self._pool = ThreadPoolExecutor(max_workers=num_workers)

    def __len__(self) -> int:
        return len(self.samples)

    @property
    def raw_hw(self) -> Tuple[int, int]:
        return self.raw_size, self.raw_size

    def _load_one(self, idx: int) -> np.ndarray:
        from PIL import Image

        path, _ = self.samples[idx]
        with Image.open(path) as im:
            im = im.convert("RGB")
            w, h = im.size
            s = self.raw_size / min(w, h)
            im = im.resize((max(1, round(w * s)), max(1, round(h * s))),
                           Image.BILINEAR)
            w, h = im.size
            left = (w - self.raw_size) // 2
            top = (h - self.raw_size) // 2
            im = im.crop((left, top, left + self.raw_size, top + self.raw_size))
            return np.asarray(im, np.uint8)

    def get_batch(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        images = np.stack(list(self._pool.map(self._load_one, indices)))
        labels = np.asarray([self.samples[i][1] for i in indices], np.int32)
        return images, labels


class FolderSource(FileListSource):
    """ImageFolder-style tree: <root>/<class_name>/<image files> (the layout
    torchvision.datasets.ImageFolder consumes, reference datasets.py:120-124).
    """

    def __init__(self, root: str, raw_size: int = 256, num_workers: int = 8):
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        if not classes:
            raise FileNotFoundError(f"No class directories under {root}")
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    samples.append((os.path.join(cdir, fname),
                                    self.class_to_idx[c]))
        super().__init__(samples, len(classes), raw_size, num_workers)


def _first_dir(*candidates: str) -> str:
    for c in candidates:
        if os.path.isdir(c):
            return c
    raise FileNotFoundError(f"none of {candidates} exists")


def flowers_source(root: str, is_train: bool, raw_size: int,
                   num_workers: int) -> FileListSource:
    """Oxford Flowers-102 in the exact layout torchvision.datasets.Flowers102
    downloads (reference datasets.py:110-117 with split train/val):
    <root>/flowers-102/jpg/image_%05d.jpg plus the .mat label/split files
    (``imagelabels.mat`` key 'labels', ``setid.mat`` keys 'trnid'/'valid',
    both 1-indexed)."""
    from scipy.io import loadmat

    base = _first_dir(os.path.join(root, "flowers-102"), root)
    labels = np.atleast_1d(loadmat(os.path.join(base, "imagelabels.mat"),
                                   squeeze_me=True)["labels"])
    setid = loadmat(os.path.join(base, "setid.mat"), squeeze_me=True)
    ids = np.atleast_1d(setid["trnid" if is_train else "valid"])
    samples = [(os.path.join(base, "jpg", f"image_{int(i):05d}.jpg"),
                int(labels[int(i) - 1]) - 1) for i in ids]
    return FileListSource(samples, DATASET_STATS["flowers"]["num_classes"],
                          raw_size, num_workers)


def stanford_cars_source(root: str, is_train: bool, raw_size: int,
                         num_workers: int) -> FileListSource:
    """Stanford Cars in torchvision.datasets.StanfordCars layout (reference
    datasets.py:96-103, split train/test): <root>/stanford_cars/ with
    ``devkit/cars_train_annos.mat`` + ``cars_train/`` for train and
    ``cars_test_annos_withlabels.mat`` + ``cars_test/`` for test; annotations
    are a struct array with 'fname' and 1-indexed 'class' fields."""
    from scipy.io import loadmat

    base = _first_dir(os.path.join(root, "stanford_cars"), root)
    if is_train:
        annos_path = os.path.join(base, "devkit", "cars_train_annos.mat")
        img_dir = os.path.join(base, "cars_train")
    else:
        annos_path = os.path.join(base, "cars_test_annos_withlabels.mat")
        img_dir = os.path.join(base, "cars_test")
    annotations = loadmat(annos_path, squeeze_me=True)["annotations"]
    samples = [(os.path.join(img_dir, str(a["fname"])), int(a["class"]) - 1)
               for a in np.atleast_1d(annotations)]
    return FileListSource(samples, DATASET_STATS["stanford_cars"]["num_classes"],
                          raw_size, num_workers)


def caltech256_source(root: str, raw_size: int,
                      num_workers: int) -> FileListSource:
    """Caltech-256 in torchvision.datasets.Caltech256 layout (reference
    datasets.py:104-109): <root>/caltech256/256_ObjectCategories/<cat>/<img>.
    Targets are indices into the sorted category list; torchvision (and hence
    the reference) has no train/val split for this dataset — the same full
    set serves both, which we mirror."""
    base = _first_dir(os.path.join(root, "caltech256", "256_ObjectCategories"),
                      os.path.join(root, "256_ObjectCategories"))
    categories = sorted(d for d in os.listdir(base)
                        if os.path.isdir(os.path.join(base, d)))
    num_classes = DATASET_STATS["caltech256"]["num_classes"]
    if len(categories) > num_classes:
        # The real archive ships 257 dirs (001..256 + '257.clutter') while the
        # reference's DATASET_STATS pins 256 classes — torchvision would emit
        # label 256 and the reference's 256-way CE would crash on it. XLA
        # *clamps* out-of-range indices, which would silently corrupt the
        # loss instead, so fail loudly with the remedy.
        raise ValueError(
            f"caltech256: found {len(categories)} category dirs under {base} "
            f"but DATASET_STATS['caltech256'] declares {num_classes} classes "
            f"(the reference crashes on the same data). Remove the extra "
            f"directories (typically '257.clutter') or adjust the registry.")
    samples: List[Tuple[str, int]] = []
    for idx, cat in enumerate(categories):
        cdir = os.path.join(base, cat)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(IMG_EXTENSIONS):
                samples.append((os.path.join(cdir, fname), idx))
    return FileListSource(samples, DATASET_STATS["caltech256"]["num_classes"],
                          raw_size, num_workers)


def build_source(cfg, is_train: bool):
    """Dataset-name dispatch (reference dataset/datasets.py:86-124)."""
    name = cfg.dataset
    if name == "synthetic" or cfg.synthetic_data:
        num_classes = DATASET_STATS.get(name, DATASET_STATS["synthetic"])["num_classes"]
        hw = 32 if cfg.input_size <= 64 else cfg.input_size
        return synthetic_source(n=2048 if is_train else 512, hw=hw,
                                num_classes=num_classes, seed=0 if is_train else 1)
    if name.startswith("cifar"):
        return cifar_source(cfg.data_path, name, is_train)
    # ImageFolder-style datasets: imagenet-1k/21k use <root>/{train,val};
    # flowers/caltech256/stanford_cars accept either <root>/<dataset>/{train,val}
    # or a flat class tree.
    split = "train" if is_train else "val"
    # Raw canvas scales with the model resolution: the eval pipeline resizes
    # to input_size/eval_crop_ratio before the center crop (reference
    # dataset/datasets.py:76-80), so the host canvas must be at least that
    # large or a 384px model would upsample a destructively cropped 256px
    # canvas.
    raw_size = max(256, int(round(cfg.input_size / cfg.eval_crop_ratio)))
    # Native torchvision archive layouts first (what the reference's
    # datasets.StanfordCars/Caltech256/Flowers102 consume on disk,
    # reference datasets.py:96-117); fall through to ImageFolder trees.
    native = {
        "flowers": lambda: flowers_source(cfg.data_path, is_train, raw_size,
                                          cfg.num_workers),
        "stanford_cars": lambda: stanford_cars_source(
            cfg.data_path, is_train, raw_size, cfg.num_workers),
        "caltech256": lambda: caltech256_source(cfg.data_path, raw_size,
                                                cfg.num_workers),
    }
    if name in native:
        try:
            return native[name]()
        except (FileNotFoundError, ImportError):
            pass  # no native archive (or no scipy for the .mat readers) —
            # fall through to a pre-converted ImageFolder tree
    candidates = [
        os.path.join(cfg.data_path, split),
        os.path.join(cfg.data_path, name, split),
        os.path.join(cfg.data_path, name),
        cfg.data_path,
    ]
    for c in candidates:
        if os.path.isdir(c) and any(
                os.path.isdir(os.path.join(c, d)) for d in os.listdir(c)):
            try:
                return FolderSource(c, raw_size=raw_size,
                                    num_workers=cfg.num_workers)
            except FileNotFoundError:
                continue
    raise FileNotFoundError(
        f"Could not locate dataset '{name}' under {cfg.data_path} "
        f"(tried {candidates})")
