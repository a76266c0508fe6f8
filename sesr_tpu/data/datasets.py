"""Datasets: Set5/Set14-style SR folders, DIV2K-RAW-style Bayer pairs, and
synthetic fallbacks.

The reference's loaders hardcode absolute paths on its author's machine
(self_dataset.py:108,212; self_dataset_sr.py:103,158), so none of its data
ships with the repo; these loaders take the directory layout as arguments
and fall back to procedurally generated data when no directory is given.
All items are NHWC float32 in [0, 1].
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from sesr_tpu.data.bayer import (
    augment_8way, expand_bayer_plane, expand_bayer_plane_dense,
    random_noise_levels, add_noise, mosaic, four2three, rggb_to_linrgb,
)


def _imread_rgb(path: str, bit_depth: Optional[int] = None) -> np.ndarray:
    """Read a PNG/JPG as HWC RGB float in [0,1]. With ``bit_depth`` given,
    normalize by 2^bit_depth - 1 UNCONDITIONALLY (the reference divides its
    12-bit PNG ground truth by 2^12-1 regardless of content,
    self_dataset.py:136,243 — a max-based heuristic would scale a dark
    12-bit image ~16x too bright); otherwise infer 8- vs 12-bit from the
    stored integer range."""
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise IOError(path)
        if img.ndim == 2:
            img = img[:, :, None].repeat(3, axis=2)
        img = img[:, :, :3][:, :, ::-1]                 # BGR -> RGB
    except ImportError:
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB"))
        if img.dtype == np.uint8 and bit_depth is not None and bit_depth > 8:
            # PIL's RGB conversion returns 8-bit data even for deeper PNGs;
            # rescale to the declared container so the unconditional
            # normalization below keeps the reference's [0,1] contract
            # (dividing 8-bit values by 2^12-1 would be ~16x too dark).
            img = img.astype(np.float32) * ((2 ** bit_depth - 1) / 255.0)
    img = img.astype(np.float32)
    if bit_depth is not None:
        return img / float(2 ** bit_depth - 1)
    return img / (4095.0 if img.max() > 255 else 255.0)


def _to_y(img_hwc: np.ndarray) -> np.ndarray:
    """BT.601 Y in [0,1] (self_dataset_sr.py:198-201)."""
    y = (65.481 * img_hwc[:, :, 0] + 128.553 * img_hwc[:, :, 1]
         + 24.966 * img_hwc[:, :, 2] + 16.0) / 255.0
    return np.clip(y, 0, 1)


class SRFolderDataset:
    """Set5/Set14-style GTmod12 + LRbicx{2,4} folder pairs
    (self_dataset_sr.py:154-217): x4 yields Y-channel pairs, x2 RGB pairs."""

    def __init__(self, gt_dir: str, scale: int):
        assert scale in (2, 4)
        self.scale = scale
        self.gt_paths: List[str] = sorted(glob.glob(os.path.join(gt_dir, "*.png")))
        if not self.gt_paths:
            raise FileNotFoundError(f"no PNGs under {gt_dir}")
        self.lr_dir = gt_dir.replace("GTmod12", f"LRbicx{scale}")
        if self.lr_dir == gt_dir:
            # the replace was a no-op — without this check the GT images
            # would silently become the model input
            raise ValueError(
                f"{gt_dir}: cannot derive the LRbicx{scale} directory — "
                f"the reference layout pairs .../GTmod12 with "
                f".../LRbicx{scale} (self_dataset_sr.py:156-159); point "
                f"--data at the GTmod12 folder")
        if not os.path.isdir(self.lr_dir):
            raise FileNotFoundError(
                f"LR directory {self.lr_dir} missing next to {gt_dir}")

    def __len__(self):
        return len(self.gt_paths)

    def __getitem__(self, i) -> Tuple[np.ndarray, np.ndarray]:
        gt_path = self.gt_paths[i]
        lr_path = os.path.join(self.lr_dir, os.path.basename(gt_path))
        gt = _imread_rgb(gt_path)
        inp = _imread_rgb(lr_path)
        if self.scale == 4:
            gt, inp = _to_y(gt)[:, :, None], _to_y(inp)[:, :, None]
        return inp[None].astype(np.float32), gt[None].astype(np.float32)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class RawBayerDataset:
    """DIV2K-RAW-style triples: `.raw` uint16 Bayer planes named
    name_H_W.raw + matching 12-bit PNG ground truth (self_dataset.py:204-318).
    The raw plane is expanded to the sparse 3-channel input.

    Yields (inp, gt, variance) — the L2 contract of SURVEY §1. The
    reference's TestDataset computes the per-pixel noise variance map
    (shot*noisy + read, from the NOISY tensor — self_dataset.py:285-288)
    but its live return statement drops it (:318, a 2-tuple; only
    TrainDataset returns its variance, :202). Here the test loader keeps
    the full triple for contract parity — zeros when add_test_noise is
    off, mirroring the reference's `variance = 0` convention for the
    noise-free branches (:281,:286 of the spec'd block). Nothing
    downstream consumes it (the reference's eval discards it too)."""

    def __init__(self, raw_dir: str, png_dir: Optional[str] = None,
                 add_test_noise: bool = False, seed: int = 0):
        self.raw_paths = sorted(glob.glob(os.path.join(raw_dir, "*.raw")))
        if not self.raw_paths:
            raise FileNotFoundError(f"no .raw files under {raw_dir}")
        self.png_dir = png_dir
        self.add_test_noise = add_test_noise
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.raw_paths)

    def __getitem__(self, i) -> Tuple[np.ndarray, np.ndarray]:
        from sesr_tpu.data import native as _native

        path = self.raw_paths[i]
        base = os.path.basename(path)
        ww, hh = int(base.split("_")[1]), int(base.split("_")[-1][:-4])
        raw = _native.read_raw(path, ww, hh)
        if raw is None:
            raw = np.fromfile(path, dtype=np.uint16).reshape(ww, hh)
        inp = _native.expand(raw, dense=False)
        if inp is None:
            inp = expand_bayer_plane(raw.astype(np.float32) / (2 ** 12 - 1))
        if self.add_test_noise:
            shot, read = random_noise_levels(self.rng)
            inp, _ = add_noise(inp, shot, read, self.rng)
            # the reference recomputes the variance from the NOISY,
            # unclamped tensor (self_dataset.py:285-288), not add_noise's
            # clean-signal variance
            variance = (shot * inp + read).astype(np.float32)
        else:
            variance = np.zeros_like(inp, dtype=np.float32)
        png = os.path.join(self.png_dir or os.path.dirname(path),
                           base.split("_")[0] + ".png")
        gt = np.clip(_imread_rgb(png, bit_depth=12), 0, 1)    # already HWC
        inp = np.clip(inp, 0, 1).transpose(1, 2, 0)           # CHW -> HWC
        return (inp[None].astype(np.float32), gt[None].astype(np.float32),
                variance.transpose(1, 2, 0)[None])

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class TrainBayerDataset:
    """Training pairs from a DIV2K-RAW-style tree: random even-aligned
    ``ps`` x ``ps`` crops of `name_W_H.raw` uint16 Bayer planes with the
    matching 12-bit PNG ground truth, shot/read noise, and the per-pixel
    noise-variance map (reference self_dataset.py:105-202).

    Items are (inp, gt, variance), all NHWC float32 — the reference's
    3-tuple contract (its train.py:66 discards the variance with
    ``inps, gts, _ = data[:]``, but the loader produces it, so this one
    does too). Reference quirks replicated: the variance is computed from
    the NOISY input (self_dataset.py:169-171 reassigns `inp` before the
    `variance =` line), not the clean one; and the train-time Bayer packing
    is the DENSE 2x2 replication (self_dataset.py:150-166,
    bayer.py:expand_bayer_plane_dense), which differs from the test
    loader's sparse packing (:259-263).
    """

    def __init__(self, raw_dir: str, png_dir: Optional[str] = None,
                 ps: int = 128, seed: int = 0):
        self.raw_paths = sorted(glob.glob(os.path.join(raw_dir, "*.raw")))
        if not self.raw_paths:
            raise FileNotFoundError(f"no .raw files under {raw_dir}")
        self.png_dir = png_dir
        self.ps = ps
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.raw_paths)

    def __getitem__(self, i) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        path = self.raw_paths[i]
        base = os.path.basename(path)
        ww, hh = int(base.split("_")[1]), int(base.split("_")[-1][:-4])
        raw = np.fromfile(path, dtype=np.uint16).reshape(ww, hh)
        png = os.path.join(self.png_dir or os.path.dirname(path),
                           base.split("_")[0] + ".png")
        gt = _imread_rgb(png, bit_depth=12)

        ps = self.ps
        # even-aligned crop keeps the RGGB phase (self_dataset.py:145-147)
        bii = int(self.rng.integers(0, max(ww - ps, 1))) // 2 * 2
        bjj = int(self.rng.integers(0, max(hh - ps, 1))) // 2 * 2
        patch = raw[bii:bii + ps, bjj:bjj + ps]
        gt = gt[bii:bii + ps, bjj:bjj + ps]

        from sesr_tpu.data import native as _native
        inp = _native.expand(patch, dense=True)
        if inp is None:
            inp = expand_bayer_plane_dense(
                patch.astype(np.float32) / (2 ** 12 - 1))
        shot, read = random_noise_levels(self.rng)
        inp, _ = add_noise(inp, shot, read, self.rng)
        variance = shot * inp + read                    # noisy-inp quirk
        inp = np.clip(inp, 0, 1).transpose(1, 2, 0)
        variance = variance.transpose(1, 2, 0)
        return (inp[None].astype(np.float32),
                np.clip(gt, 0, 1)[None].astype(np.float32),
                variance[None].astype(np.float32))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class TrainMatDataset:
    """Training pairs from 14-bit RGGB-plane .mat crops — the reference's
    primary train loader (self_dataset_sr.py:101-152): random ``ps`` crop,
    greens averaged into linear RGB, 8-way dihedral augmentation, then the
    per-task degradation (gamma + BT.601 luma + bicubic 1/4 downscale for
    SR; RGGB mosaic + shot/read noise for NR/DM/NRDM).

    Items are (inp, gt, variance) NHWC float32, the reference's 3-tuple
    contract; `task` replaces its MFLAG integer.
    """

    MFLAGS = {"nr": 1, "dm": 2, "nrdm_3": 3, "nrdm_6": 4, "sr_x4": 5}

    def __init__(self, mat_dir: str, task: str, ps: int = 128,
                 key: str = "mat_crop", seed: int = 0):
        assert task in self.MFLAGS, task
        self.paths = sorted(glob.glob(os.path.join(mat_dir, "*.mat")))
        if not self.paths:
            raise FileNotFoundError(f"no .mat files under {mat_dir}")
        self.task, self.ps, self.key = task, ps, key
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        import scipy.io as scio

        img = np.asarray(scio.loadmat(self.paths[i])[self.key])
        img = img / (2 ** 14 - 1.0)                     # 14-bit planes
        ww, hh = img.shape[:2]
        ps = self.ps
        bii = int(self.rng.integers(0, max(ww - ps, 1)))
        bjj = int(self.rng.integers(0, max(hh - ps, 1)))
        linrgb = rggb_to_linrgb(img[bii:bii + ps, bjj:bjj + ps, :])
        linrgb = np.clip(
            augment_8way(linrgb, int(self.rng.integers(0, 8))), 0, 1)

        t = self.task
        if t == "sr_x4":
            linrgb = linrgb ** (1 / 2.2)
            gt = (0.299 * linrgb[:, :, 0] + 0.587 * linrgb[:, :, 1]
                  + 0.114 * linrgb[:, :, 2])
            inp = _bicubic_resize(gt, 1 / 4.0)
            return (inp[None, :, :, None].astype(np.float32),
                    gt[None, :, :, None].astype(np.float32),
                    np.zeros((), np.float32))
        four = mosaic(np.clip(linrgb, 0, 1).transpose(2, 0, 1))
        shot, read = random_noise_levels(self.rng)
        if t == "dm":
            gt = linrgb
            inp = four2three(four)
            variance = np.zeros((), np.float32)
        elif t == "nr":
            gt = four2three(four).transpose(1, 2, 0)
            noisy, _ = add_noise(four, shot, read, self.rng)
            # reference quirk: variance from the NOISY tensor
            # (self_dataset_sr.py:142-144)
            variance = (shot * noisy + read).astype(np.float32)
            inp = four2three(noisy)
        else:                                           # nrdm_3 / nrdm_6
            gt = linrgb
            noisy, _ = add_noise(four, shot, read, self.rng)
            variance = (shot * noisy + read).astype(np.float32)
            inp = four2three(noisy)
        inp = np.clip(inp.transpose(1, 2, 0), 0, 1)
        gt = np.clip(np.asarray(gt), 0, 1)
        if variance.ndim:
            variance = variance.transpose(1, 2, 0)[None]
        return (inp[None].astype(np.float32), gt[None].astype(np.float32),
                variance)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def _bicubic_resize(img_hw: np.ndarray, factor: float) -> np.ndarray:
    """Bicubic resize (reference cv2.INTER_CUBIC, self_dataset_sr.py:130);
    PIL fallback when cv2 is absent."""
    try:
        import cv2
        return cv2.resize(img_hw, (0, 0), fx=factor, fy=factor,
                          interpolation=cv2.INTER_CUBIC)
    except ImportError:
        from PIL import Image
        h, w = img_hw.shape[:2]
        im = Image.fromarray(img_hw.astype(np.float32), mode="F")
        return np.asarray(im.resize((int(w * factor), int(h * factor)),
                                    Image.BICUBIC))


class SyntheticDataset:
    """Procedural stand-in when no real data directory is available: smooth
    random images through the task-appropriate degradation (Bayer mosaic +
    shot/read noise for nr/dm/nrdm per self_dataset.py:183-200; bicubic-ish
    downscale for SR)."""

    def __init__(self, task: str, n: int = 8, hw=(96, 128), seed: int = 0):
        self.task, self.n, self.hw = task, n, hw
        self.seed = seed

    def __len__(self):
        return self.n

    def _smooth_image(self, rng, h, w, c=3):
        small = rng.random((h // 8, w // 8, c), dtype=np.float32)
        img = np.kron(small, np.ones((8, 8, 1), np.float32))
        return np.clip(img, 0, 1)

    def __getitem__(self, i) -> Tuple[np.ndarray, np.ndarray]:
        rng = np.random.default_rng(self.seed + i)
        h, w = self.hw
        linrgb = self._smooth_image(rng, h, w)
        return task_pair_from_image(self.task, linrgb, rng)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def task_pair_from_image(task: str, img_hwc: np.ndarray,
                         rng: np.random.Generator,
                         sr_bicubic: bool = False
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """(inp, gt) NHWC pair for `task` from one HWC RGB image in [0, 1] via
    the task-appropriate degradation: Bayer mosaic + shot/read noise for
    nr/dm/nrdm (self_dataset.py:183-200), downscale for SR — stride
    subsample by default (the synthetic pipeline's choice), true bicubic
    with sr_bicubic=True (the reference's LRbicx convention,
    self_dataset_sr.py:130)."""
    t = task
    if t in ("nr", "dm", "nrdm_3", "nrdm_6"):
        linrgb = img_hwc
        four = mosaic(linrgb.transpose(2, 0, 1))
        if t == "dm":
            gt = linrgb
            inp = four2three(four)
        elif t == "nr":
            gt = four2three(four).transpose(1, 2, 0)
            noisy, _ = add_noise(four, *random_noise_levels(rng), rng)
            inp = four2three(noisy)
        else:
            gt = linrgb
            noisy, _ = add_noise(four, *random_noise_levels(rng), rng)
            inp = four2three(noisy)
        inp = np.clip(inp.transpose(1, 2, 0), 0, 1)
        gt = np.clip(np.asarray(gt), 0, 1)
    else:
        scale = 4 if t == "sr_x4" else 2
        gt = img_hwc
        if sr_bicubic:
            inp = np.clip(_bicubic_resize(gt, 1.0 / scale), 0, 1)
        else:
            inp = gt[::scale, ::scale, :]
        if t == "sr_x4":
            gt, inp = _to_y(gt)[:, :, None], _to_y(inp)[:, :, None]
    return inp[None].astype(np.float32), gt[None].astype(np.float32)


def builtin_real_images() -> List[np.ndarray]:
    """Real photographic images available offline in this environment, HWC
    RGB float in [0, 1]: matplotlib's bundled public-domain sample
    photograph (grace_hopper.jpg, 600x512), scikit-learn's two bundled
    sample photographs (china.jpg / flower.jpg, 427x640 outdoor scenes),
    plus — when a reference checkout is mounted — its committed
    training-preview PNGs (train.py:80-86 dumps, real DIV2K-RAW-derived
    content, 64x192). Returns [] when none are available (no network
    access is attempted)."""
    imgs: List[np.ndarray] = []
    try:
        import matplotlib
        p = os.path.join(os.path.dirname(matplotlib.__file__),
                         "mpl-data", "sample_data", "grace_hopper.jpg")
        if os.path.exists(p):
            imgs.append(_imread_rgb(p))
    except ImportError:
        pass
    try:
        import sklearn.datasets as skd
        root = os.path.join(os.path.dirname(skd.__file__), "images")
        for name in ("china.jpg", "flower.jpg"):
            p = os.path.join(root, name)
            if os.path.exists(p):
                imgs.append(_imread_rgb(p))
    except ImportError:
        pass
    for p in sorted(glob.glob("/root/reference/[0-9]temp.png")):
        try:
            imgs.append(_imread_rgb(p))
        except Exception:
            pass
    return imgs


class RealImageDataset:
    """Real-pixel evaluation/calibration set (VERDICT r1: every accuracy
    number was synthetic). Crops of `hw` are tiled deterministically from
    builtin_real_images() (images smaller than `hw` are skipped), shuffled
    by `seed`, and run through the same per-task degradations as the real
    dataset loaders — with sRGB->linear (gamma 2.2) for the raw-domain
    tasks (whose reference data is linear sensor RGB, self_dataset.py:105-
    202) and true bicubic LR for SR (self_dataset_sr.py:130). When more
    crops are requested than exist, shape-preserving flips extend the set
    (the 4 non-rotating elements of the reference's 8-way dihedral
    augmentation, self_dataset.py:15-32)."""

    RAW_TASKS = ("nr", "dm", "nrdm_3", "nrdm_6")

    def __init__(self, task: str, n: int = 6, hw=(96, 128), seed: int = 0):
        self.task, self.n, self.hw = task, n, hw
        h, w = hw
        crops: List[np.ndarray] = []
        for img in builtin_real_images():
            ih, iw = img.shape[:2]
            for y in range(0, ih - h + 1, h):
                for x in range(0, iw - w + 1, w):
                    crops.append(img[y:y + h, x:x + w])
        if not crops:
            raise FileNotFoundError(
                "no builtin real images available at >= %dx%d" % hw)
        rng = np.random.default_rng(seed)
        rng.shuffle(crops)
        self.crops = crops
        self.seed = seed
        if n > 4 * len(crops):
            import warnings
            warnings.warn(
                f"RealImageDataset: {n} items requested but only "
                f"{4 * len(crops)} distinct crop+flip variants exist; items "
                f"beyond that repeat earlier ones exactly (for the "
                f"noise-free tasks) or re-noise them (nr/nrdm)")

    def __len__(self):
        return self.n

    def __getitem__(self, i) -> Tuple[np.ndarray, np.ndarray]:
        base = self.crops[i % len(self.crops)]
        mode = (i // len(self.crops)) % 4
        if mode & 1:
            base = base[::-1]
        if mode & 2:
            base = base[:, ::-1]
        img = np.ascontiguousarray(base, dtype=np.float32)
        if self.task in self.RAW_TASKS:
            img = img ** 2.2                       # sRGB -> linear-ish
        rng = np.random.default_rng(self.seed + 1000 + i)
        return task_pair_from_image(self.task, img, rng, sr_bicubic=True)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def load_reference_fixture(task: str, reference_root: str = "/root/reference"):
    """The reference's golden sim inputs rand_{SR,DM}_Input_80x960.pt
    (sim.py:197-205), as NHWC numpy."""
    import torch
    name = ("rand_SR_Input_80x960.pt" if task in ("sr_x4",)
            else "rand_DM_Input_80x960.pt")
    x = torch.load(os.path.join(reference_root, name), map_location="cpu")
    return x.numpy().transpose(0, 2, 3, 1)
