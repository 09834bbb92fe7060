"""ImageNet-21K datasets (parity: reference
simpleAICV/classification/datasets/imagenet21kdataset.py — single-label folder
reader plus the semantic-tree variant that converts labels into 11 hierarchy
levels using the miil semantic tree ('imagenet21k_miil_tree.pth'); the
hierarchy normalisation factors feed SemanticSoftmaxLoss)."""

from __future__ import annotations

import os
from typing import Callable, Optional

import cv2
import numpy as np


class ImageNet21KSingleLabelDataset:

    def __init__(self, root_dir: str, set_name: str = "train",
                 transform: Optional[Callable] = None):
        self.root_dir = root_dir
        self.set_name = set_name
        self.transform = transform
        self._items = None

    def _scan(self):
        if self._items is not None:
            return
        set_dir = os.path.join(self.root_dir, self.set_name)
        classes = sorted(os.listdir(set_dir))
        self.class_name_to_label = {c: i for i, c in enumerate(classes)}
        items = []
        for c in classes:
            cdir = os.path.join(set_dir, c)
            for fname in os.listdir(cdir):
                items.append((os.path.join(cdir, fname),
                              self.class_name_to_label[c]))
        self._items = sorted(items)

    def __len__(self):
        self._scan()
        return len(self._items)

    def __getitem__(self, idx):
        self._scan()
        path, label = self._items[idx]
        image = cv2.cvtColor(cv2.imread(path),
                             cv2.COLOR_BGR2RGB).astype(np.float32)
        sample = {"image": image, "label": int(label)}
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class ImageNet21KSemanticTreeLabelDataset(ImageNet21KSingleLabelDataset):
    """Loads the miil semantic tree and precomputes, per hierarchy level, the
    class indices at that level and the loss normalisation factors
    (reference imagenet21kdataset.py:91-204). Labels are converted to
    fixed-shape [n_hierarchies] semantic labels at collate time
    (convert_single_labels_to_semantic_labels, :221-244)."""

    def __init__(self, root_dir: str, set_name: str = "train",
                 transform: Optional[Callable] = None,
                 tree_file: str = "imagenet21k_miil_tree.pth"):
        super().__init__(root_dir, set_name, transform)
        self._tree_loaded = False
        self.tree_path = os.path.join(root_dir, tree_file)

    def _load_tree(self):
        if self._tree_loaded:
            return
        import torch
        tree = torch.load(self.tree_path, map_location="cpu",
                          weights_only=False)
        self.class_tree_list = tree["class_tree_list"]
        num_classes = len(self.class_tree_list)
        depth = np.array([len(t) - 1 for t in self.class_tree_list])
        max_depth = int(depth.max()) + 1
        hist = np.bincount(depth, minlength=max_depth).astype(np.float64)
        # hierarchy index lists: classes whose subtree depth >= level
        self.hierarchy_indices_list = []
        for level in range(max_depth):
            if hist[level] > 1:
                idxs = np.where(depth >= level)[0]
                self.hierarchy_indices_list.append(idxs)
        # normalisation factors (reference :148-157)
        norm = np.zeros(len(self.hierarchy_indices_list))
        cum = np.cumsum(hist[::-1])[::-1]
        for i in range(len(norm)):
            norm[i] = cum[i]
        norm = cum[0] / np.clip(norm, 1.0, None)
        self.normalization_factor_list = np.clip(norm, None, 20.0)
        self._tree_loaded = True

    def convert_outputs_to_semantic_outputs(self, outputs):
        self._load_tree()
        return [outputs[:, idx] for idx in self.hierarchy_indices_list]

    def convert_single_labels_to_semantic_labels(self, labels):
        self._load_tree()
        labels = np.asarray(labels)
        n_h = len(self.hierarchy_indices_list)
        out = np.full((labels.shape[0], n_h), -1, np.int64)
        # position lookup per hierarchy
        if not hasattr(self, "_pos_lookup"):
            self._pos_lookup = []
            for idxs in self.hierarchy_indices_list:
                lut = {int(c): i for i, c in enumerate(idxs)}
                self._pos_lookup.append(lut)
        for i, label in enumerate(labels):
            chain = self.class_tree_list[int(label)]
            levels = len(chain)
            for j, cls in enumerate(chain):
                level = levels - j - 1
                if level >= n_h:
                    continue
                out[i, level] = self._pos_lookup[level].get(int(cls), -1)
        return out


class ImageNet21KSemanticCollater:
    """Stacks images and converts labels to semantic hierarchy labels."""

    def __init__(self, dataset: ImageNet21KSemanticTreeLabelDataset):
        self.dataset = dataset

    def __call__(self, samples):
        images = np.stack([s["image"] for s in samples]).astype(np.float32)
        labels = np.asarray([s["label"] for s in samples], np.int64)
        semantic = self.dataset.convert_single_labels_to_semantic_labels(
            labels)
        return {"image": images, "label": labels.astype(np.int32),
                "semantic_label": semantic.astype(np.int32)}
