"""Generator parity vs the reference's shipped assets.

The ChaCha20 host RNG (tools/chacha.py) replicates rand 0.9's stream and
float conversions bit-for-bit, so `gen-final-one-weekend` must reproduce
assets/final-one-weekend*.json sphere-for-sphere (tools/src/main.rs:25-31:
one seed, static scene first, motion blur continuing the stream)."""

import json

import numpy as np
import pytest

from conftest import reference_asset

from raytrace_tpu.tools.chacha import ChaCha20Rng, _chacha20_block
from raytrace_tpu.tools.generate import generate_final_one_weekend_pair


def test_chacha20_zero_vector():
    """Known ChaCha20 keystream for zero key / zero nonce / counter 0."""
    import struct

    w = _chacha20_block((0,) * 8, 0, 0)
    ks = b"".join(struct.pack("<I", x) for x in w)
    assert ks[:16].hex() == "76b8e0ada0f13d90405d6ae55386bd28"


def test_seed_from_u64_deterministic():
    a = ChaCha20Rng.seed_from_u64(485_674_845_675_491)
    b = ChaCha20Rng.seed_from_u64(485_674_845_675_491)
    assert [a.next_u32() for _ in range(8)] == [b.next_u32() for _ in range(8)]


def _prims_by_name(doc):
    out = {}
    for p in doc["primitives"]:
        body = p[next(iter(p))]
        out[body["name"]] = body
    return out


def _textures_by_name(doc):
    out = {}
    for t in doc["textures"]:
        body = t[next(iter(t))]
        out[body["name"]] = (next(iter(t)), body)
    return out


@pytest.fixture(scope="module")
def generated_pair():
    return generate_final_one_weekend_pair()


@pytest.mark.parametrize("blur", [False, True])
def test_generated_matches_shipped(generated_pair, blur):
    name = ("final-one-weekend-motion-blur.json" if blur
            else "final-one-weekend.json")
    shipped = json.load(open(reference_asset(name)))
    ours = generated_pair[1 if blur else 0].to_json_dict()

    sp, op = _prims_by_name(shipped), _prims_by_name(ours)
    assert set(sp) == set(op)
    for pname, sbody in sp.items():
        obody = op[pname]
        np.testing.assert_array_equal(
            np.asarray(sbody["center"], np.float32),
            np.asarray(obody["center"], np.float32), err_msg=pname)
        assert sbody["material"] == obody["material"], pname
        assert sbody["radius"] == pytest.approx(obody["radius"])

    st, ot = _textures_by_name(shipped), _textures_by_name(ours)
    assert set(st) == set(ot)
    for tname, (kind, sbody) in st.items():
        okind, obody = ot[tname]
        assert kind == okind, tname
        if "rgb" in sbody:
            np.testing.assert_array_equal(
                np.asarray(sbody["rgb"], np.float32),
                np.asarray(obody["rgb"], np.float32), err_msg=tname)

    # Motion-blur: animated translate draws must match too.
    def transforms(doc):
        out = {}
        for i in doc["instances"]:
            if i.get("transform"):
                out[i["name"]] = i["transform"]
        return out

    stf, otf = transforms(shipped), transforms(ours)
    assert set(stf) == set(otf)
    if blur:
        assert len(stf) > 300  # ~390 animated diffuse spheres
        for iname, s in stf.items():
            o = otf[iname]
            np.testing.assert_array_equal(
                np.asarray(s["animated"][0]["translate"], np.float32),
                np.asarray(o["animated"][0]["translate"], np.float32),
                err_msg=iname)
