"""caffemodel2pkl: pure-protobuf .caffemodel decoding (no pycaffe).

Fixtures are hand-encoded with an independent wire-format writer, so the
parser is checked against the protobuf spec rather than against itself.
Covers the three container vintages (V2 `layer`, V1 `layers`, V0 nested
connection), packed and unpacked float data, shape-proto and legacy-dim
blobs, and the end-to-end path into checkpoint.importer.load_pretrained.
"""

import numpy as np
import pytest

from squeezedet_tpu.tools.caffemodel2pkl import (
    dump_caffemodel_weights, parse_caffemodel, main)
from squeezedet_tpu.checkpoint.importer import load_pretrained


# --- independent protobuf writer ---------------------------------------

def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field, wire):
    return _varint((field << 3) | wire)


def _ld(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _f32(field, value):
    return _tag(field, 5) + np.float32(value).tobytes()


def _vi(field, value):
    return _tag(field, 0) + _varint(value)


def _blob_modern(arr, packed=True):
    """BlobProto with a shape submessage (field 7) + float data (5)."""
    shape_msg = b"".join(
        [_ld(1, b"".join(_varint(d) for d in arr.shape))] if packed
        else [_vi(1, d) for d in arr.shape])
    data = arr.astype("<f4").ravel()
    if packed:
        body = _ld(5, data.tobytes())
    else:
        body = b"".join(_f32(5, v) for v in data)
    return body + _ld(7, shape_msg)


def _blob_legacy(arr4d):
    """BlobProto with legacy num/channels/height/width fields."""
    n, c, h, w = arr4d.shape
    return (_vi(1, n) + _vi(2, c) + _vi(3, h) + _vi(4, w) +
            _ld(5, arr4d.astype("<f4").ravel().tobytes()))


def _blob_double(arr):
    shape_msg = _ld(1, b"".join(_varint(d) for d in arr.shape))
    return _ld(8, arr.astype("<f8").ravel().tobytes()) + _ld(7, shape_msg)


def _v2_layer(name, blobs):
    return _ld(1, name.encode()) + b"".join(_ld(7, b) for b in blobs)


def _v1_layer(name, blobs):
    return _ld(4, name.encode()) + b"".join(_ld(6, b) for b in blobs)


def _v0_connection(name, blobs):
    v0 = _ld(1, name.encode()) + b"".join(_ld(50, b) for b in blobs)
    return _ld(1, v0)  # V1LayerParameter.layer = 1 (deprecated V0)


def _net(layers, field):
    # NetParameter: name=1 (exercise skipping), layer=100 / layers=2
    return _ld(1, b"testnet") + b"".join(_ld(field, l) for l in layers)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def test_v2_packed_and_empty_layers(tmp_path, rng):
    k = rng.randn(64, 3, 3, 3).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    net = _net([
        _v2_layer("conv1", [_blob_modern(k), _blob_modern(b)]),
        _v2_layer("relu_conv1", []),          # parameter-less layer kept
    ], field=100)
    p = tmp_path / "v2.caffemodel"
    p.write_bytes(net)
    w = parse_caffemodel(str(p))
    assert list(w) == ["conv1", "relu_conv1"]
    np.testing.assert_array_equal(w["conv1"][0], k)
    np.testing.assert_array_equal(w["conv1"][1], b)
    assert w["relu_conv1"] == []


def test_v1_unpacked_floats_and_unpacked_dims(tmp_path, rng):
    k = rng.randn(2, 3, 1, 1).astype(np.float32)
    net = _net([_v1_layer("fire2/squeeze1x1",
                          [_blob_modern(k, packed=False)])], field=2)
    p = tmp_path / "v1.caffemodel"
    p.write_bytes(net)
    w = parse_caffemodel(str(p))
    np.testing.assert_array_equal(w["fire2/squeeze1x1"][0], k)


def test_v0_nested_connection(tmp_path, rng):
    k = rng.randn(4, 2, 3, 3).astype(np.float32)
    net = _net([_v0_connection("conv_old", [_blob_legacy(k)])], field=2)
    p = tmp_path / "v0.caffemodel"
    p.write_bytes(net)
    w = parse_caffemodel(str(p))
    np.testing.assert_array_equal(w["conv_old"][0], k)


def test_legacy_bias_stays_4d_like_pycaffe(tmp_path, rng):
    # caffe Blob::FromProto keeps legacy blobs 4-D; pycaffe reports
    # (1,1,1,N) for old-format biases and the reference's shape check
    # (nn_skeleton.py:500-502) then falls back to random init.  Parity
    # means reproducing that, not fixing it.
    bias = rng.randn(1, 1, 1, 64).astype(np.float32)
    net = _net([_v1_layer("conv1", [_blob_legacy(bias)])], field=2)
    p = tmp_path / "legacy.caffemodel"
    p.write_bytes(net)
    w = parse_caffemodel(str(p))
    assert w["conv1"][0].shape == (1, 1, 1, 64)


def test_double_data_blob(tmp_path, rng):
    arr = rng.randn(3, 5)
    net = _net([_v2_layer("fc", [_blob_double(arr)])], field=100)
    p = tmp_path / "f64.caffemodel"
    p.write_bytes(net)
    w = parse_caffemodel(str(p))
    np.testing.assert_array_equal(w["fc"][0], arr)


def test_shape_mismatch_raises(tmp_path):
    bad = _ld(5, np.zeros(3, "<f4").tobytes()) + _ld(7, _ld(1, _varint(4)))
    net = _net([_v2_layer("bad", [bad])], field=100)
    p = tmp_path / "bad.caffemodel"
    p.write_bytes(net)
    with pytest.raises(ValueError, match="does not match"):
        parse_caffemodel(str(p))


def test_not_a_caffemodel_raises(tmp_path):
    p = tmp_path / "junk.caffemodel"
    p.write_bytes(_ld(1, b"name-only, no layers"))
    with pytest.raises(ValueError, match="no layers"):
        parse_caffemodel(str(p))


def test_end_to_end_pkl_into_importer(tmp_path, rng):
    """CLI -> joblib pkl -> load_pretrained, the full conversion path the
    reference exercised through pycaffe (caffemodel2pkl.py:20-29)."""
    k = rng.randn(64, 3, 3, 3).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    net = _net([_v2_layer("conv1", [_blob_modern(k), _blob_modern(b)])],
               field=100)
    cm = tmp_path / "model.caffemodel"
    cm.write_bytes(net)
    out = tmp_path / "weights.pkl"
    main([str(tmp_path / "deploy.prototxt"), str(cm), str(out)])
    w = load_pretrained(str(out))
    np.testing.assert_array_equal(w["conv1"][0], k)  # OIHW, as importer expects
    np.testing.assert_array_equal(w["conv1"][1], b)


def test_two_arg_cli(tmp_path, rng):
    k = rng.randn(1, 1, 1, 1).astype(np.float32)
    cm = tmp_path / "m.caffemodel"
    cm.write_bytes(_net([_v2_layer("c", [_blob_modern(k)])], field=100))
    out = tmp_path / "w.pkl"
    main([str(cm), str(out)])
    assert out.exists()


def test_bad_cli_usage():
    with pytest.raises(SystemExit, match="Usage"):
        main(["one-arg"])
