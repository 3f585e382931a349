"""RGB-D / focal-stack datasets and augmentation.

Numpy port of the reference `dff/dataset.py` (same directory layouts, scale
factors, and augmentation policy), plus a light thread-prefetching loader that
replaces `torch.utils.data.DataLoader` — host-side IO feeding device arrays.
All images are returned CHW float32 like the reference's ToTensor output.
"""
from __future__ import annotations

import os
import queue
import random
import threading
from glob import glob

import numpy as np

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
import cv2 as cv
from scipy.ndimage import rotate


def _to_chw(img_hwc):
    return np.ascontiguousarray(np.transpose(img_hwc, (2, 0, 1))).astype(np.float32)


def _resize_hw(img, resize):
    """resize: (H, W) like the reference transforms.Resize."""
    return cv.resize(img, (resize[1], resize[0]), interpolation=cv.INTER_LINEAR)


def _rotate(img, degree):
    """Rotation for augmentation: the native C++ bilinear kernel when built
    (~25x faster than scipy's spline rotate — see native/aadff_io.cpp),
    scipy otherwise."""
    from . import native_ops

    if native_ops.available():
        return native_ops.rotate(img, degree)
    return rotate(img, degree, reshape=False)


# ================================
# Augmentation (reference dff/dataset.py:252-286)
# ================================
def auto_augment(img, depth, rng=None):
    """img: [H, W, 3] (or [H, W, 3, S]); depth: [H, W]."""
    rng = np.random if rng is None else rng
    if rng.rand() > 0.5:
        contrast = rng.rand()
        brightness = rng.rand()
        img = np.clip((0.5 + contrast * (img - 0.5)) + brightness, 0.0, 1.0)
    if rng.rand() > 0.5:
        img = np.flip(img, 1)
        depth = np.flip(depth, 1)
    if rng.rand() > 0.5:
        img = np.flip(img, 0)
        depth = np.flip(depth, 0)
    if rng.rand() > 0.5:
        degree = rng.randint(0, 180)
        img = np.ascontiguousarray(img, np.float32)
        if img.ndim == 4:
            for i in range(img.shape[-1]):
                img[..., i] = _rotate(img[..., i], degree)
        else:
            img = _rotate(img, degree)
        depth = _rotate(depth.astype(np.float32), degree)
        depth = np.where(depth < 0, 0, depth)
    return np.ascontiguousarray(img), np.ascontiguousarray(depth)


AutoAgument = auto_augment  # reference spelling (dff/dataset.py:252)


# ================================
# Datasets
# ================================
class Dataset:
    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx):
        raise NotImplementedError


class Matterport3D(Dataset):
    """RGB-D pairs (reference dff/dataset.py:17-52); depth png / 4000 -> [m]."""

    def __init__(self, rgb_path, depth_path, resize=None, train=True):
        self.rgb_path = rgb_path
        self.depth_path = depth_path
        self.scenes = [s.split("/")[-1] for s in glob(f"{rgb_path}/*")]
        self.resize = resize
        self.train = train
        self.imgs, self.depths = [], []
        for scene in self.scenes:
            self.imgs += sorted(glob(f"{rgb_path}/{scene}/undistorted_color_images/*.jpg"))
            self.depths += sorted(glob(f"{depth_path}/{scene}/render_depth/*.png"))

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, idx):
        aif = cv.cvtColor(cv.imread(self.imgs[idx]), cv.COLOR_BGR2RGB) / 255.0
        depth = cv.imread(self.depths[idx], -1) / 4000  # [m]
        if self.train:
            aif, depth = auto_augment(aif, depth)
        aif = _resize_hw(aif.astype(np.float32), self.resize)
        depth = _resize_hw(depth.astype(np.float32), self.resize)
        return [_to_chw(aif), depth[None].astype(np.float32)]


class FlyingThings3D(Dataset):
    """AiF or pre-rendered focal stacks (reference dff/dataset.py:55-110)."""

    DEPTH_FACTOR = 20

    def __init__(self, dataset_dir, resize=None, train=True, fs_num=0):
        self.dataset_dir = dataset_dir
        self.scenes = [s.split("/")[-1] for s in glob(f"{dataset_dir}/*")]
        self.resize = resize
        self.fs_num = fs_num
        self.train = train

    def __len__(self):
        return len(self.scenes)

    def _read_disp(self, scene):
        """disp.exr as in the reference (dataset.py:79); .pfm/.npy fallbacks
        for environments whose OpenCV lacks the EXR codec."""
        d = self.dataset_dir
        if os.path.exists(f"{d}/{scene}/disp.exr"):
            return cv.imread(
                f"{d}/{scene}/disp.exr", cv.IMREAD_ANYCOLOR | cv.IMREAD_ANYDEPTH
            )
        if os.path.exists(f"{d}/{scene}/disp.pfm"):
            from ..utils.image import read_pfm

            return read_pfm(f"{d}/{scene}/disp.pfm")[0]
        return np.load(f"{d}/{scene}/disp.npy")

    def __getitem__(self, index):
        d = self.dataset_dir
        scene = self.scenes[index]
        resize = (self.resize[1], self.resize[0])
        depth = cv.resize(self._read_disp(scene) / self.DEPTH_FACTOR, resize)
        if self.fs_num > 0:
            focused, fdists = [], []
            stack_files = sorted(glob(f"{d}/{scene}/*.png"))[:-1]
            for name in random.sample(stack_files, self.fs_num):
                fdists.append(float(name.split("/")[-1][:-4]) / self.DEPTH_FACTOR)
                focused.append(
                    cv.resize(cv.imread(name).astype(np.float32) / 255.0, resize)
                )
            stack = np.stack(focused, axis=-1)
            if self.train:
                stack, depth = auto_augment(stack, depth)
            stack = np.transpose(stack, (3, 2, 0, 1)).astype(np.float32)  # [S,C,H,W]
            return [stack, depth[None].astype(np.float32),
                    np.asarray(fdists, np.float32)]
        aif = cv.cvtColor(cv.imread(f"{d}/{scene}/AiF.png"), cv.COLOR_BGR2RGB) / 255.0
        if self.train:
            aif, depth = auto_augment(aif, depth)
        aif = _resize_hw(aif.astype(np.float32), self.resize)
        depth = _resize_hw(depth.astype(np.float32), self.resize)
        return [_to_chw(aif), depth[None].astype(np.float32)]


class Middlebury(Dataset):
    """Middlebury2014/2021 eval set (reference dff/dataset.py:173-205).

    The reference stores a ``train`` flag but applies the same transform
    either way; here ``train=True`` actually enables the shared augmentation
    policy (like Matterport3D/FlyingThings3D) so the set can be trained on.
    Default ``train=False`` keeps exact reference eval behavior.
    """

    def __init__(self, dataset_dir, resize=None, train=False):
        self.dataset_dir = dataset_dir
        self.scenes = sorted(s.split("/")[-1] for s in glob(f"{dataset_dir}/*"))
        self.resize = resize
        self.train = train

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, index):
        d, scene = self.dataset_dir, self.scenes[index]
        resize = (self.resize[1], self.resize[0])
        aif = cv.cvtColor(cv.imread(f"{d}/{scene}/im0.png"), cv.COLOR_BGR2RGB) / 255.0
        depth = cv.resize(cv.imread(f"{d}/{scene}/depth.png", -1) / 1000, resize)
        if self.train:
            aif, depth = auto_augment(aif, depth)
        aif = _resize_hw(aif.astype(np.float32), self.resize)
        return [_to_chw(aif), depth[None].astype(np.float32)]


class RealWorld(Dataset):
    """Captured focal stacks, focus distance parsed from filenames
    (reference dff/dataset.py:208-246)."""

    def __init__(self, dataset_dir, resize=None, depth=False):
        self.dataset_dir = dataset_dir
        self.scenes = sorted(s.split("/")[-1] for s in glob(f"{dataset_dir}/*"))
        self.resize = resize
        self.depth = depth

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, index):
        d, scene = self.dataset_dir, self.scenes[index]
        resize = (self.resize[1], self.resize[0])
        focused, fdists = [], []
        stack_files = (
            sorted(glob(f"{d}/{scene}/align/*.png"))
            + sorted(glob(f"{d}/{scene}/*.JPG"))
            + sorted(glob(f"{d}/{scene}/*.png"))
        )
        for name in stack_files:
            fdists.append(float(name.split("/")[-1].split("_")[1][4:]) / 1000)
            focused.append(cv.resize(cv.imread(name).astype(np.float32) / 255.0, resize))
        stack = np.transpose(np.stack(focused, axis=-1), (3, 2, 0, 1)).astype(np.float32)
        if self.depth:
            depth = cv.resize(cv.imread(f"{d}/{scene}/depth/depth.png", -1), resize)
            depth = (depth / 65535 * 3000 + 500) / 1000
            depth = depth[None].astype(np.float32)
        else:
            depth = np.zeros_like(stack[0, 0][None])
        return [stack, depth, np.asarray(fdists, np.float32)]


# ================================
# Loader (replaces torch DataLoader)
# ================================
class NumpyLoader:
    """Batching iterator with optional shuffling and background prefetch."""

    def __init__(self, dataset, batch_size=1, shuffle=False, prefetch=2, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        for b in range(len(self)):
            items = [self.dataset[int(i)]
                     for i in idx[b * self.batch_size : (b + 1) * self.batch_size]]
            yield [np.stack([it[k] for it in items]) for k in range(len(items[0]))]

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        DONE = object()

        def worker():
            # Exceptions (corrupt/missing files) are forwarded to the consumer
            # so a failed __getitem__ raises in the training loop instead of
            # silently truncating the epoch.
            try:
                for batch in self._batches():
                    q.put(batch)
                q.put(DONE)
            except BaseException as e:  # noqa: BLE001 - re-raised on consumer side
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
