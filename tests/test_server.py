"""Daemon + client wire-protocol tests (the reference only exercises this
manually via netcat, BSGSD.md:74-99 — we do better and automate it)."""

import socket

import pytest

from keyhunt_tpu.ref import ecc
from keyhunt_tpu.search.bsgs import build_baby_table
from keyhunt_tpu.server import BsgsdServer
from keyhunt_tpu.client import BsgsdClient, chunk_range, scan_for_pubkey

# device-graph compiles dominate on XLA:CPU — excluded from the fast tier
pytestmark = pytest.mark.slow

KEY = 7777


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tbl = build_baby_table(256, pivots=2, width=32, steps=2)
    tmp = tmp_path_factory.mktemp("srv")
    srv = BsgsdServer(tbl, port=0, lanes=4, steps=2,
                      result_path=str(tmp / "found.txt"))
    srv.start()
    yield srv
    srv.stop()


def test_raw_protocol_found(server):
    pub = ecc.compress(ecc.pubkey(KEY)).hex()
    cli = BsgsdClient("127.0.0.1", server.port, timeout=300)
    got = cli.query(pub, 1, 16384)
    assert got == f"{KEY:064x}"


def test_raw_protocol_not_found(server):
    pub = ecc.compress(ecc.pubkey(1 << 60)).hex()
    cli = BsgsdClient("127.0.0.1", server.port, timeout=300)
    assert cli.query(pub, 1, 16384) is None


def test_raw_protocol_bad_request(server):
    with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
        s.sendall(b"garbage\n")
        assert s.recv(4096).startswith(b"400")


def test_http_protocol(server):
    pub = ecc.compress(ecc.pubkey(KEY)).hex()
    cli = BsgsdClient("127.0.0.1", server.port, timeout=300, http=True)
    assert cli.query(pub, 1, 16384) == f"{KEY:064x}"
    assert cli.query(ecc.compress(ecc.pubkey(1 << 60)).hex(), 1, 16384) is None


def test_http_headers(server):
    pub = ecc.compress(ecc.pubkey(KEY)).hex()
    body = ('{"pubkey": "%s", "from": "1", "to": "4000"}' % pub).encode()
    req = (b"POST /search HTTP/1.1\r\nHost: x\r\nContent-Type: application/json\r\n"
           + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
    with socket.create_connection(("127.0.0.1", server.port), timeout=300) as s:
        s.sendall(req)
        data = b""
        while not data.endswith(b"\n"):
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
    assert b"X-Elapsed-Seconds:" in data
    assert f"{KEY:064x}".encode() in data


def test_chunk_range():
    cs = chunk_range(1, 100, 30)
    assert [(c.k_from, c.k_to) for c in cs] == [(1, 30), (31, 60), (61, 90), (91, 100)]


def test_scan_for_pubkey(server, tmp_path):
    pub = ecc.compress(ecc.pubkey(KEY)).hex()
    res = scan_for_pubkey(pub, 1, 16384, [("127.0.0.1", server.port)],
                          chunk_size=4096, timeout=300,
                          matches_csv=str(tmp_path / "matches.csv"),
                          failed_log=str(tmp_path / "failed.txt"))
    assert res.found[pub] == f"{KEY:064x}"
    assert (tmp_path / "matches.csv").exists()
