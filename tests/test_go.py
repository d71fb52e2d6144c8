"""Go app: moves codec, rules, training, valid accuracy, GTP engine,
self-play (src_yolo2/go.c:1-846 behaviors)."""

import io

import numpy as np
import pytest

from sr_object_detection_tpu.apps import go_app as G


TOY_CFG = """\
[net]
batch=8
subdivisions=1
height=19
width=19
channels=1
momentum=0.9
decay=0.0005
learning_rate=0.05
policy=constant
max_batches=100

[convolutional]
filters=16
size=3
stride=1
pad=1
activation=relu
batch_normalize=1

[convolutional]
filters=1
size=1
stride=1
pad=1
activation=linear

[softmax]

[cost]
type=sse
"""


@pytest.fixture()
def toy_cfg(tmp_path):
    p = tmp_path / "go_toy.cfg"
    p.write_text(TOY_CFG)
    return str(p)


def _random_board(rng, stones=30):
    b = np.zeros((19, 19), np.float32)
    idx = rng.choice(361, stones, replace=False)
    b.reshape(-1)[idx[:stones // 2]] = 1
    b.reshape(-1)[idx[stones // 2:]] = -1
    return b


def test_board_codec_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        b = _random_board(rng)
        packed = G.board_to_string(b)
        assert packed.shape == (91,)
        np.testing.assert_array_equal(G.string_to_board(packed), b)


def test_moves_file_roundtrip(tmp_path):
    """Record format: fixed 94-byte rows [row, col, 91 bytes, newline]
    (go.c:21-52) — binary-safe even when packed bytes contain 0x0A."""
    rng = np.random.default_rng(1)
    path = tmp_path / "go.train"
    recs = []
    with open(path, "wb") as f:
        for _ in range(7):
            b = _random_board(rng)
            r, c = map(int, rng.integers(0, 19, 2))
            rec = bytes([r, c]) + G.board_to_string(b).tobytes()
            f.write(rec + b"\n")
            recs.append((r, c, b))
    m = G.load_go_moves(str(path))
    assert m.shape == (7, 93)
    for i, (r, c, b) in enumerate(recs):
        assert (m[i, 0], m[i, 1]) == (r, c)
        np.testing.assert_array_equal(G.string_to_board(m[i, 2:]), b)


def test_random_go_moves_augmentation():
    """Label one-hot tracks the board under flip/rotate, and the move
    cell is cleared on the board (go.c:91-116)."""
    rng0 = np.random.default_rng(2)
    b = _random_board(rng0)
    r, c = 3, 7
    b[r, c] = 1          # the record includes the played move
    rec = np.concatenate([[r, c], G.board_to_string(b)]).astype(np.uint8)
    moves = rec[None].repeat(16, axis=0)
    boards, labels = G.random_go_moves(moves, np.random.default_rng(3), 16)
    assert boards.shape == (16, 19, 19) and labels.shape == (16, 19, 19)
    for i in range(16):
        # exactly one label cell, and that cell is empty on the board
        assert labels[i].sum() == 1.0
        pos = np.unravel_index(np.argmax(labels[i]), (19, 19))
        assert boards[i][pos] == 0.0
        # stone counts preserved by the dihedral transform (minus the
        # cleared move stone)
        assert (boards[i] == 1).sum() == (b == 1).sum() - 1


def test_capture_and_suicide():
    b = np.zeros((19, 19), np.float32)
    # white stone at (0,0) with one liberty; black plays (1,0) after
    # (0,1) -> capture
    b[0, 0] = -1
    b[0, 1] = 1
    G.move_go(b, 1, 1, 0)
    assert b[0, 0] == 0                    # captured (move_go, go.c:307)
    # suicide: empty corner surrounded by enemy
    b2 = np.zeros((19, 19), np.float32)
    b2[0, 1] = -1
    b2[1, 0] = -1
    assert G.suicide_go(b2, 1, 0, 0)
    # not suicide when it captures: the surrounding group has 1 liberty
    b3 = np.zeros((19, 19), np.float32)
    b3[0, 1] = -1
    b3[1, 0] = -1
    b3[0, 2] = 1
    b3[1, 1] = 1
    b3[2, 0] = 1
    assert not G.suicide_go(b3, 1, 0, 0)


def test_ko_legality():
    """legal_go forbids recreating the position two plies back
    (go.c:343-355): a real ko retake is illegal until the ko buffer
    moves on."""
    b = np.zeros((19, 19), np.float32)
    b[0, 1] = 1
    b[1, 0] = 1
    b[1, 2] = 1
    b[0, 2] = -1
    b[1, 3] = -1
    other_string = G.board_to_string(b)
    # a move whose RESULT equals the ko buffer is illegal
    target = b.copy()
    G.move_go(target, 1, 5, 5)
    assert not G.legal_go(b, G.board_to_string(target), 1, 5, 5)
    # the same move against a different ko buffer is legal
    assert G.legal_go(b, other_string, 1, 5, 5)
    assert G.legal_go(b, None, 1, 5, 5)
    assert not G.legal_go(b, None, 1, 0, 1)        # occupied


def test_tromp_taylor_score():
    b = np.zeros((19, 19), np.float32)
    # black wall on column 9: left empty region -> black; right mixed
    b[:, 9] = 1
    b[5, 15] = -1
    # black: 19 stones + 9*19 empty left territory; right region
    # borders both colors -> neutral
    s = G.tromp_taylor_score(b, komi=0.0)
    assert s == 19 + 9 * 19 - 1
    # komi shifts
    assert G.tromp_taylor_score(b) == pytest.approx(s - 6.5)


def test_train_go_decreasing_loss(toy_cfg, tmp_path):
    """train_go (go.c:118-171) drives Trainer to decreasing loss on a
    toy moves set with a learnable move prior."""
    rng = np.random.default_rng(4)
    path = tmp_path / "go.train"
    with open(path, "wb") as f:
        for _ in range(64):
            b = _random_board(rng, stones=10)
            b[9, 9] = 0
            # the move is always the center -> learnable prior
            rec = bytes([9, 9]) + G.board_to_string(b).tobytes()
            f.write(rec + b"\n")
    trainer, losses = G.train_go(
        toy_cfg, None,
        ["-moves", str(path), "-backup", str(tmp_path / "bk")],
        max_batches=30, log_every=10)
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])   # learning
    assert (tmp_path / "bk" / "go_toy.weights").exists()


def test_valid_go_accuracy(toy_cfg, tmp_path):
    rng = np.random.default_rng(5)
    path = tmp_path / "go.test"
    with open(path, "wb") as f:
        for _ in range(6):
            b = _random_board(rng, stones=8)
            b[3, 3] = 0
            f.write(bytes([3, 3]) + G.board_to_string(b).tobytes()
                    + b"\n")
    acc = G.valid_go(toy_cfg, None, ["-moves", str(path)], quiet=True)
    assert 0.0 <= acc <= 1.0


def test_engine_go_gtp_session(toy_cfg):
    """GTP loop (engine_go, go.c:434-605): id echo, protocol answers,
    play/genmove round-trip with legal vertex output."""
    cmds = "\n".join([
        "1 protocol_version",
        "2 name",
        "3 known_command genmove",
        "4 known_command frobnicate",
        "5 boardsize 19",
        "6 boardsize 13",
        "7 clear_board",
        "8 komi 6.5",
        "9 play black Q16",
        "10 genmove white",
        "11 quit",
    ]) + "\n"
    out = io.StringIO()
    G.engine_go(toy_cfg, None, [], stdin=io.StringIO(cmds), stdout=out)
    res = out.getvalue()
    assert "=1 2" in res
    assert "=3 true" in res and "=4 false" in res
    assert "=5" in res and "?6 unacceptable size" in res
    assert "=9" in res
    # genmove answers a vertex (letter+number, no 'I') or pass
    for line in res.splitlines():
        if line.startswith("=10"):
            mv = line.split()[1]
            assert mv == "pass" or (
                mv[0] in "ABCDEFGHJKLMNOPQRST"
                and 1 <= int(mv[1:]) <= 19)
            break
    else:
        pytest.fail("no genmove response")


def test_engine_go_play_updates_board(toy_cfg):
    """A played stone occupies its cell: genmove for the same color
    never returns an occupied vertex."""
    cmds = "clear_board\nplay black D4\ngenmove black\nquit\n"
    out = io.StringIO()
    G.engine_go(toy_cfg, None, [], stdin=io.StringIO(cmds), stdout=out)
    moves = [l.split()[1] for l in out.getvalue().splitlines()
             if l.startswith("= ") and len(l.split()) > 1]
    assert "D4" not in moves


def test_self_go_plays_and_emits_records(toy_cfg):
    """self_go (go.c:748-824): one full game finishes, is scored, and
    the winner's moves round-trip through the moves-file codec."""
    buf = io.BytesIO()
    results = G.self_go(toy_cfg, None, argv=[], max_games=1, out=buf)
    assert len(results) == 1 and np.isfinite(results[0])
    raw = buf.getvalue()
    assert len(raw) % 94 == 0 and len(raw) > 0
    m = np.frombuffer(raw, np.uint8).reshape(-1, 94)[:, :93]
    # every record decodes to a valid board + in-range move
    for rec in m:
        assert rec[0] < 19 and rec[1] < 19
        b = G.string_to_board(rec[2:])
        assert set(np.unique(b)).issubset({-1.0, 0.0, 1.0})


def test_dihedral_ensemble_consistency(toy_cfg):
    """-multi (predict_move, go.c:269-291): the 8-transform average is
    itself invariant under the dihedral group when the input is."""
    eng = G.GoEngine(toy_cfg)
    board = np.zeros((19, 19), np.float32)   # symmetric input
    single = eng.predict_move(board)
    multi = eng.predict_move(board, multi=True)
    assert multi.shape == (19, 19)
    # averaging over symmetries of a symmetric input must produce a
    # (numerically) symmetric map
    np.testing.assert_allclose(multi, multi[:, ::-1], atol=1e-5)
    np.testing.assert_allclose(multi, np.rot90(multi), atol=1e-5)
    assert np.isfinite(single).all()
