"""Decode-once packed dataset cache: fixed-stride binary record store.

TPU-first replacement for the reference's assumption of 16+ host CPU cores
per accelerator running JPEG decode + PIL augmentation in DataLoader worker
processes (reference tools/train_classification_model.py:74-94). On TPU
hosts the CPU budget per chip is small; steady-state training should read
*bytes*, not decode JPEGs. The pack stores every sample's fields (image on
the uint8 lattice at the training transport resolution, labels/annotations)
as fixed-stride records in one mmap-able file, written ONCE by
``tools/prepare_dataset.py pack-*``. A training batch read is then a single
C memcpy gather (csrc/native_io.cpp nio_gather_records, GIL-released) — no
per-sample Python, no decode, no pickle transport — feeding the on-device
augmentation pipeline (data/device_augment.py) through the uint8 transport.

Layout (version 1)::

    [0 : 8192)                      header: magic + '\\n' + JSON, NUL-padded
    [field0_off : field0_off+size)  field 0, [N, *shape] C-contiguous
    [field1_off : ...)              field 1, ...

Each field region is 4096-byte aligned so mmap slices are page-aligned.
JSON header: {"version": 1, "num_samples": N,
"fields": [{"name", "shape", "dtype", "offset"}...], "meta": {...}}.

Classes:
  * PackWriter / PackReader — write / mmap-read the store
  * PackedDataset           — per-sample dict view (standard dataset
                              protocol; composes with data/loader.DataLoader
                              and any collater, e.g. for eval transforms)
  * PackedLoader            — the fast path: per-batch single-gather reads
                              on a prefetch thread, same external protocol
                              as data/loader.DataLoader (set_epoch/len/iter;
                              multi-host sharding via jax.process_index)
"""

from __future__ import annotations

import json
import os
import threading
import queue
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from . import native_io

_MAGIC = b"SAICVPACK1"
_HEADER_BYTES = 8192
_ALIGN = 4096


def _align(n: int) -> int:
    return (n + _ALIGN - 1) // _ALIGN * _ALIGN


class PackWriter:
    """Streaming writer. Fields are declared up front (fixed per-sample
    shape/dtype — the same static-shape contract XLA wants); samples are
    appended with :meth:`add` and the header is finalized by :meth:`close`.
    """

    def __init__(self, path: str,
                 fields: Dict[str, Tuple[Sequence[int], str]],
                 num_samples: int, meta: Optional[dict] = None):
        self.path = path
        self.num_samples = int(num_samples)
        self._fields: List[dict] = []
        off = _HEADER_BYTES
        for name, (shape, dtype) in fields.items():
            dt = np.dtype(dtype)
            shape = tuple(int(s) for s in shape)
            size = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
            self._fields.append({
                "name": name, "shape": list(shape), "dtype": dt.str,
                "offset": off, "record_bytes": size,
            })
            off = _align(off + size * self.num_samples)
        self.total_bytes = off
        self.meta = dict(meta or {})
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "wb")
        self._f.truncate(self.total_bytes)
        self._n = 0

    def add(self, sample: dict, index: Optional[int] = None):
        i = self._n if index is None else int(index)
        assert 0 <= i < self.num_samples, (i, self.num_samples)
        for fld in self._fields:
            # (np.ascontiguousarray promotes 0-d to 1-d; keep exact shapes)
            arr = np.asarray(sample[fld["name"]], np.dtype(fld["dtype"]),
                             order="C")
            expect = tuple(fld["shape"])
            assert arr.shape == expect, (fld["name"], arr.shape, expect)
            self._f.seek(fld["offset"] + i * fld["record_bytes"])
            self._f.write(arr.tobytes())
        if index is None:
            self._n += 1

    def close(self):
        header = _MAGIC + b"\n" + json.dumps({
            "version": 1,
            "num_samples": self.num_samples,
            "fields": self._fields,
            "meta": self.meta,
        }).encode()
        assert len(header) < _HEADER_BYTES, "header too large"
        self._f.seek(0)
        self._f.write(header.ljust(_HEADER_BYTES, b"\0"))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PackReader:
    """mmap view of a pack. ``arrays[name]`` is an [N, *shape] np.memmap;
    :meth:`read_batch` gathers a batch with one C memcpy pass per field."""

    def __init__(self, path: str, keep_in_ram: Optional[Sequence[str]] = None):
        self.path = path
        with open(path, "rb") as f:
            head = f.read(_HEADER_BYTES)
        assert head[:len(_MAGIC)] == _MAGIC, f"not a pack file: {path}"
        info = json.loads(head[len(_MAGIC) + 1:].rstrip(b"\0").decode())
        assert info["version"] == 1, info["version"]
        self.num_samples = info["num_samples"]
        self.meta = info.get("meta", {})
        self.fields = {f["name"]: f for f in info["fields"]}
        self.arrays: Dict[str, np.ndarray] = {}
        keep = set(keep_in_ram if keep_in_ram is not None
                   else self._small_fields())
        for f in info["fields"]:
            mm = np.memmap(path, np.dtype(f["dtype"]), mode="r",
                           offset=f["offset"],
                           shape=(self.num_samples, *f["shape"]))
            # tiny per-sample fields (labels) are cheaper resident in RAM
            self.arrays[f["name"]] = np.array(mm) if f["name"] in keep else mm

    def _small_fields(self, thresh: int = 64) -> List[str]:
        return [n for n, f in self.fields.items()
                if f["record_bytes"] <= thresh]

    def __len__(self):
        return self.num_samples

    def read_batch(self, indices: np.ndarray,
                   n_threads: int = 1) -> Dict[str, np.ndarray]:
        """One gather per field: native GIL-released memcpy when the IO
        library is present, numpy fancy indexing otherwise (identical
        output)."""
        idx = np.asarray(indices, np.int64)
        out = {}
        for name, arr in self.arrays.items():
            if isinstance(arr, np.memmap) and arr.nbytes > (1 << 16):
                got = native_io.gather_records(arr, idx, n_threads=n_threads)
                out[name] = got if got is not None else arr[idx]
            else:
                out[name] = arr[idx]
        return out

    def read_sample(self, i: int) -> dict:
        s = {}
        for name, arr in self.arrays.items():
            v = np.array(arr[int(i)])
            s[name] = v.item() if v.ndim == 0 else v
        return s


class PackedDataset:
    """Per-sample dict view over a pack — the standard dataset protocol, so
    it composes with data/loader.DataLoader, collaters, and host transforms
    (eval pipelines). ``scalar_label`` unwraps 0-d labels to python ints to
    match the folder datasets' samples."""

    def __init__(self, path: str, transform=None):
        self.reader = PackReader(path)
        self.transform = transform
        self.class_names = self.reader.meta.get("class_names")

    def __len__(self):
        return len(self.reader)

    def __getitem__(self, i):
        s = self.reader.read_sample(i)
        if "image" in s:
            s["image"] = s["image"].astype(np.float32)
        if self.transform is not None:
            s = self.transform(s)
        return s


class PackedLoader:
    """Batch iterator over a pack: the steady-state training input path.

    Per batch: ONE gather per field (C memcpy) on a background prefetch
    thread — host cost is memory bandwidth, not decode. The external
    protocol matches data/loader.DataLoader (``set_epoch`` / ``__len__`` /
    ``__iter__`` yielding host batch dicts), so Trainer's device-prefetch
    (shard + async device_put) composes unchanged. Multi-host: disjoint
    contiguous shards by jax.process_index, like DataLoader.

    Images stay uint8 end-to-end (pack -> gather -> H2D): the on-device
    augmentation pipeline casts to f32 on chip (data/device_augment.py).
    """

    def __init__(self, source, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, prefetch: int = 2,
                 n_threads: int = 1, collate=None):
        if isinstance(source, str):
            source = PackReader(source)
        elif isinstance(source, PackedDataset):
            source = source.reader
        self.reader: PackReader = source
        self.global_batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = max(int(prefetch), 1)
        self.n_threads = max(int(n_threads), 1)
        self.collate = collate
        self.epoch = 0
        import jax
        n_proc = jax.process_count()
        assert batch_size % n_proc == 0, (batch_size, n_proc)
        self.local_batch_size = batch_size // n_proc
        self._pid, self._nproc = jax.process_index(), n_proc

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.reader) // self._nproc
        if self.drop_last:
            return n // self.local_batch_size
        return (n + self.local_batch_size - 1) // self.local_batch_size

    def _local_indices(self) -> np.ndarray:
        n = len(self.reader)
        if self.shuffle:
            order = np.random.RandomState(
                self.seed + self.epoch).permutation(n)
        else:
            order = np.arange(n)
        per = n // self._nproc
        return order[self._pid * per:(self._pid + 1) * per]

    def __iter__(self) -> Iterator[dict]:
        indices = self._local_indices()
        bs = self.local_batch_size
        n_batches = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idx = indices[b * bs:min((b + 1) * bs, len(indices))]
                    batch = self.reader.read_batch(idx, self.n_threads)
                    if self.collate is not None:
                        batch = self.collate(batch)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.05)
                            break
                        except queue.Full:
                            continue
            except Exception as e:  # noqa: BLE001 — forwarded to consumer
                while not stop.is_set():
                    try:
                        q.put(e, timeout=0.05)
                        return
                    except queue.Full:
                        continue
                return
            while not stop.is_set():
                try:
                    q.put(StopIteration, timeout=0.05)
                    return
                except queue.Full:
                    continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is StopIteration:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


# ----------------------------------------------------------------------
# writers: dataset / folder -> pack
# ----------------------------------------------------------------------

def pack_dataset(dataset, out_path: str, image_dtype: str = "uint8",
                 extra_fields: Optional[Dict[str, Tuple[tuple, str]]] = None,
                 meta: Optional[dict] = None,
                 progress_every: int = 0) -> str:
    """Pack any per-sample dataset whose items are dicts of fixed-shape
    arrays (image + label/mask/annots). Field specs are inferred from
    sample 0; images are stored on the uint8 lattice (clip + round)."""
    n = len(dataset)
    s0 = dataset[0]
    fields: Dict[str, Tuple[tuple, str]] = {}
    for k, v in s0.items():
        arr = np.asarray(v)
        if not (np.issubdtype(arr.dtype, np.number)
                or np.issubdtype(arr.dtype, np.bool_)):
            continue  # host-only payloads (paths, text) are not packed
        if k == "image" and image_dtype == "uint8":
            fields[k] = (arr.shape, "uint8")
        elif arr.ndim == 0:
            fields[k] = ((), "int32" if np.issubdtype(arr.dtype, np.integer)
                         else "float32")
        else:
            fields[k] = (arr.shape, arr.dtype.str)
    if extra_fields:
        fields.update(extra_fields)
    with PackWriter(out_path, fields, n, meta=meta) as w:
        for i in range(n):
            s = dict(dataset[i])
            if "image" in fields and fields["image"][1] == "uint8":
                s["image"] = np.clip(np.round(
                    np.asarray(s["image"], np.float32)), 0, 255)
            w.add({k: s[k] for k in fields}, index=i)
            if progress_every and (i + 1) % progress_every == 0:
                print(f"packed {i + 1}/{n}")
    return out_path


def pack_image_folder(root: str, out_path: str, image_hw: int = 224,
                      letterbox: bool = False, batch: int = 256,
                      n_threads: int = 0,
                      progress_every: int = 10000) -> str:
    """Pack an ImageFolder-layout dataset (class-sorted subdirs, the
    ILSVRC2012 on-disk contract — reference ilsvrc2012dataset.py:8) into
    uint8 records at the training transport resolution, decoding with the
    native threaded JPEG path. One-time cost; steady-state epochs then read
    bytes instead of decoding."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    paths, labels = [], []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(root, cname)
        for fname in sorted(os.listdir(cdir)):
            paths.append(os.path.join(cdir, fname))
            labels.append(ci)
    n = len(paths)
    fields = {"image": ((image_hw, image_hw, 3), "uint8"),
              "label": ((), "int32")}
    meta = {"class_names": classes, "source_root": os.path.abspath(root),
            "image_hw": image_hw, "letterbox": bool(letterbox)}
    use_native = native_io.available()
    n_failed = 0
    with PackWriter(out_path, fields, n, meta=meta) as w:
        for b0 in range(0, n, batch):
            chunk = paths[b0:b0 + batch]
            imgs = None
            if use_native:
                imgs, ok = native_io.batch_decode_files_u8(
                    chunk, image_hw, n_threads=n_threads,
                    letterbox=letterbox, return_ok=True)
                if imgs is not None:
                    n_failed += len(chunk) - ok
            if imgs is None:  # no native lib: cv2 fallback, same geometry
                import cv2
                imgs = np.zeros((len(chunk), image_hw, image_hw, 3),
                                np.uint8)
                for j, p in enumerate(chunk):
                    im = cv2.imread(p)
                    if im is None:
                        n_failed += 1
                        continue
                    im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
                    if letterbox:
                        # match csrc/native_io.cpp resize_u8: aspect-
                        # preserving scale-to-fit, bottom/right zero pad
                        sh, sw = im.shape[:2]
                        scale = min(image_hw / sh, image_hw / sw)
                        rh = max(1, int(round(sh * scale)))
                        rw = max(1, int(round(sw * scale)))
                        imgs[j, :rh, :rw] = cv2.resize(im, (rw, rh))
                    else:
                        imgs[j] = cv2.resize(im, (image_hw, image_hw))
            for j in range(len(chunk)):
                w.add({"image": imgs[j],
                       "label": np.int32(labels[b0 + j])}, index=b0 + j)
            if progress_every and (b0 + len(chunk)) % progress_every < batch:
                print(f"packed {b0 + len(chunk)}/{n}")
        # recorded in the header so consumers can audit the pack; a silent
        # all-zero training image is a data bug, not a tolerable default
        w.meta["decode_failures"] = int(n_failed)
    if n_failed:
        import warnings
        warnings.warn(f"pack_image_folder: {n_failed}/{n} images failed to "
                      f"decode; their records are zero-filled "
                      f"(meta['decode_failures'])", stacklevel=2)
    return out_path
