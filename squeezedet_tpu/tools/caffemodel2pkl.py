"""Convert a caffemodel into the joblib pickle the weight importer reads.

Equivalent of reference src/utils/caffemodel2pkl.py: dumps
{layer_name: [blob0, blob1, ...]} via joblib.  Requires pycaffe, which is
not in this image — the tool degrades to a clear error, and the rest of
the framework consumes already-converted pickles (or TF1 checkpoints)
through squeezedet_tpu.checkpoint.importer.
"""

from __future__ import annotations

import sys


def dump_caffemodel_weights(prototxt_path: str, caffemodel_path: str,
                            weights_path: str) -> None:
    try:
        import caffe  # noqa: F401
    except ImportError as e:
        raise SystemExit(
            "pycaffe is not available in this environment; convert the "
            "caffemodel on a machine with caffe installed, then feed the "
            "resulting .pkl to --pretrained_model_path.") from e
    import joblib
    net = caffe.Net(prototxt_path, caffemodel_path, caffe.TEST)
    weights = {}
    for name, layer in zip(net._layer_names, net.layers):
        weights[name] = [b.data[...] for b in layer.blobs]
    joblib.dump(weights, weights_path)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3:
        raise SystemExit(
            "Usage: python -m squeezedet_tpu.tools.caffemodel2pkl "
            "<prototxt> <caffemodel> <out.pkl>")
    dump_caffemodel_weights(*argv)


if __name__ == "__main__":
    main()
