"""Native C++ codec differential tests: parse/serialize must agree with the
pure-Python implementations byte-for-byte (parse) and value-for-value."""

import numpy as np
import pytest

from sayuri_tpu import native
from sayuri_tpu.train import dataset as DS


@pytest.fixture(scope="module")
def chunk_text():
    """Generate a real chunk via the self-play pipeline."""
    import jax

    from tests.test_selfplay import small_setup
    from sayuri_tpu.selfplay.actor import assemble_targets
    from sayuri_tpu.selfplay import data as D

    env, actor = small_setup()
    states = env.new_batch(2, komi=4.5)
    final, records = actor.play_games(states, jax.random.PRNGKey(21), max_moves=40)
    targets = assemble_targets(env, final, records)
    games = D.games_to_text(env, records, targets)
    text = "".join(p for g in games for p in g)
    assert text
    return text


def test_lib_builds():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no g++ available")
    assert lib.sayuri_codec_version() == 1


def test_parse_matches_python(chunk_text):
    if native.get_lib() is None:
        pytest.skip("no g++ available")
    out = native.parse_positions(chunk_text, bsize=5)
    assert out is not None and out["planes"].shape[0] > 0

    # python reference parse
    import io

    lines = chunk_text.splitlines()
    n = len(lines) // 53
    assert out["planes"].shape[0] == n
    for i in range(n):
        s = DS.Sample(lines[i * 53 : (i + 1) * 53])
        s.parse()
        np.testing.assert_array_equal(
            out["planes"][i], s.planes, err_msg=f"planes {i}"
        )
        np.testing.assert_allclose(out["prob"][i], s.prob, atol=1e-6)
        np.testing.assert_allclose(out["aux"][i], s.aux_prob, atol=1e-6)
        np.testing.assert_array_equal(out["own"][i], s.ownership)
        sc = out["scalars"][i]
        assert sc[0] == s.board_size
        np.testing.assert_allclose(sc[1], s.komi, atol=1e-5)
        assert sc[4] == s.to_move
        assert sc[5] == s.result
        np.testing.assert_allclose(
            sc[6:10],
            [s.avg_q, s.short_avg_q, s.mid_avg_q, s.long_avg_q],
            atol=1e-5,
        )
        np.testing.assert_allclose(sc[17], s.kld, atol=1e-5)


def test_serialize_roundtrip(chunk_text):
    if native.get_lib() is None:
        pytest.skip("no g++ available")
    out = native.parse_positions(chunk_text, bsize=5)
    text2 = native.serialize_positions(
        5, out["planes"], out["prob"], out["aux"], out["own"], out["scalars"]
    )
    out2 = native.parse_positions(text2, bsize=5)
    for k in out:
        np.testing.assert_allclose(
            out[k], out2[k], atol=1e-5, err_msg=f"field {k}"
        )
