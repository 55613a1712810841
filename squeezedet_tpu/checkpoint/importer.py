"""Legacy weight importers.

Two cold-start formats, mirroring the reference:

* caffe-derived joblib pickles: {layer_name: [kernel OIHW, bias, ...]}
  consumed by layer constructors with an OIHW->HWIO transpose
  (nn_skeleton.py:404-421, 492-529; producer: src/utils/caffemodel2pkl.py);
* TF1 ``model.ckpt-*`` training checkpoints (the released
  model.ckpt-87000, demo.py:32-33) whose variables are named
  ``<layer>/kernels`` and ``<layer>/biases`` (nn_skeleton.py:425,430) —
  already HWIO, converted back to the pickle's OIHW layout so one code
  path consumes both.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np


class TrackedWeights(dict):
    """Pretrained-weight dict that records which entries were consumed,
    so a cold start can warn about checkpoint weights that matched no
    model layer (a silent drop would leave layers at random init)."""

    def __init__(self, data):
        super().__init__(data)
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)

    def unconsumed(self):
        return sorted(set(self.keys()) - self.consumed)


def warn_unconsumed(weights) -> List[str]:
    """Print (and return) the entries of a TrackedWeights never read by
    any layer constructor — typically a --net mismatch or a naming-map
    gap (cf. reference nn_skeleton.py:404-439 which silently skips)."""
    if not isinstance(weights, TrackedWeights):
        return []
    leftover = weights.unconsumed()
    if leftover:
        print('WARNING: {} pretrained entries matched no model layer and '
              'were ignored: {}'.format(len(leftover), ', '.join(leftover)))
    return leftover


def load_pretrained(path: str) -> Dict[str, List[np.ndarray]]:
    """Load either a joblib pkl or a TF1 checkpoint into the caffe-pkl
    layout ({name: [kernel OIHW, bias]})."""
    if not path:
        raise ValueError("empty pretrained model path")
    # TF checkpoints are 'path.index'+'path.data-*' pairs.
    if os.path.exists(path + ".index") or path.endswith(".ckpt") or \
            ".ckpt-" in os.path.basename(path):
        return load_tf1_checkpoint(path)
    import joblib
    weights = joblib.load(path)
    return {k: [np.asarray(b) for b in blobs] for k, blobs in weights.items()}


def load_tf1_checkpoint(path: str) -> Dict[str, List[np.ndarray]]:
    """Read a TF1 Saver checkpoint via tf.train.load_checkpoint and map it
    into the caffe-pkl dict layout.

    Variable naming contract (nn_skeleton.py:401-439):
      conv layers:   '<name>/kernels' (HWIO), '<name>/biases'
      conv_bn:       '<conv>/kernels', '<conv>/gamma', '<conv>/beta',
                     '<conv>/mean', '<conv>/var' — note the reference
                     scopes all five under the *conv* param name.
    """
    import tensorflow as tf  # CPU-only TF is available in the image

    reader = tf.train.load_checkpoint(path)
    shapes = reader.get_variable_to_shape_map()
    out: Dict[str, List[np.ndarray]] = {}
    bn_parts: Dict[str, Dict[str, np.ndarray]] = {}
    unmapped = []
    for var in shapes:
        scope, _, leaf = var.rpartition("/")
        if leaf == "kernels":
            kernel = reader.get_tensor(var)  # HWIO
            out.setdefault(scope, [None, None])[0] = \
                np.transpose(kernel, (3, 2, 0, 1))  # -> OIHW
        elif leaf == "biases":
            out.setdefault(scope, [None, None])[1] = reader.get_tensor(var)
        elif leaf in ("gamma", "beta", "mean", "var"):
            bn_parts.setdefault(scope, {})[leaf] = reader.get_tensor(var)
        elif leaf != "Momentum" and var not in ("global_step", "iou"):
            # anything else (beyond known optimizer/bookkeeping slots)
            # means the naming contract above missed a weight
            unmapped.append(var)
    if unmapped:
        print('WARNING: {} checkpoint variables do not follow the '
              'kernels/biases/BN naming contract and were dropped: '
              '{}'.format(len(unmapped), ', '.join(sorted(unmapped))))

    # Re-emit BN pieces in the pkl layout the init code expects:
    #   pretrained[bn_name]    = [mean, var]
    #   pretrained[scale_name] = [gamma, beta]
    # The TF1 names carry only the conv scope, so synthesize bn_/scale_
    # names from it (matching _conv_bn_layer's callers, e.g.
    # resnet50_convDet.py:49-51: conv 'res2a_branch1' <-> bn 'bn2a_branch1'
    # <-> scale 'scale2a_branch1').
    for scope, parts in bn_parts.items():
        if not {"mean", "var", "gamma", "beta"} <= set(parts):
            print('WARNING: incomplete batch-norm group at scope {!r} '
                  '(found only {}); its weights were dropped'.format(
                      scope, sorted(parts)))
            continue
        if scope.startswith("res"):
            stem = scope[len("res"):]
        elif scope.startswith("conv"):
            stem = "_" + scope
        else:
            stem = "_" + scope
        out["bn" + stem] = [parts["mean"], parts["var"]]
        out["scale" + stem] = [parts["gamma"], parts["beta"]]

    # Drop incomplete entries (e.g. optimizer slots).
    cleaned = {}
    for name, blobs in out.items():
        blobs = [b for b in blobs if b is not None]
        if blobs:
            cleaned[name] = [np.asarray(b) for b in blobs]
    return cleaned
