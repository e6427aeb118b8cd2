"""Wire-protocol backend sink (stages/backend_sink.py + stages/amqp.py):
the reference BackendClient's REST semantics (core/backend.py:10-187)
against a local in-process HTTP server — payload mappings byte-exact,
duplicate window, zero-price block, both response dialects — and the
completion notification (backend.py:189-234) against an in-process fake
AMQP 0-9-1 broker that runs the real server-side handshake and records
the durable queue declare + persistent publish."""

import json
import socket
import struct
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from realestate_scraper_ray.stages.amqp import (
    BASIC_PUBLISH, CHAN_OPEN, CHAN_OPEN_OK, CONN_CLOSE, CONN_CLOSE_OK,
    CONN_OPEN, CONN_OPEN_OK, CONN_START, CONN_START_OK, CONN_TUNE,
    CONN_TUNE_OK, FRAME_BODY, FRAME_HEADER, FRAME_METHOD, QUEUE_DECLARE,
    QUEUE_DECLARE_OK, AmqpPublisher, longstr, method_frame, parse_method,
    read_frame, shortstr, write_frame,
)
from realestate_scraper_ray.stages.backend_sink import (
    BackendClient, BackendUploader, upload_offers,
)

OFFER = {
    "offer_id": "otodom-123", "source": "otodom",
    "url": "https://example.test/o/123",
    "price_amount": 499000.0, "price_currency": "PLN",
    "price_per_m2": 9980.0, "city": "Gdańsk",
    "lat": 54.35, "lon": 18.65, "area_m2": 50.0, "rooms": 3,
    "description": "Mieszkanie " + "x" * 6000,
}


# -- fake REST backend --------------------------------------------------------


class _Rest(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):
        pass

    def do_POST(self):
        srv = self.server
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n)) if n else {}
        srv.calls.append((self.path, payload))
        if self.path == "/api/apartments/duplicates/check":
            body = json.dumps(srv.dup_response).encode()
            status = 200
        elif self.path == "/api/apartments":
            srv.next_id += 1
            body = json.dumps({"id": srv.next_id}).encode()
            status = 201
        elif self.path == "/api/photos":
            body = b"{}"
            status = 201
        else:
            body, status = b"nope", 404
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def rest():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Rest)
    srv.calls, srv.next_id, srv.dup_response = [], 100, {"has_matches": False}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}/api"
    srv.shutdown()
    srv.server_close()


# -- fake AMQP broker ---------------------------------------------------------


class FakeBroker:
    """Server side of the publish handshake; records (queue declare
    bits, publish routing key, delivery mode, body) per connection."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.declares, self.publishes, self.auth = [], [], []
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()

    @property
    def port(self):
        return self.sock.getsockname()[1]

    def close(self):
        self.sock.close()

    def _serve(self):
        while True:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._session, args=(conn,),
                             daemon=True).start()

    def _session(self, conn: socket.socket):
        try:
            assert conn.recv(8) == b"AMQP\x00\x00\x09\x01"
            write_frame(conn, FRAME_METHOD, 0, method_frame(
                CONN_START, struct.pack("BB", 0, 9) + longstr(b"")
                + longstr(b"PLAIN") + longstr(b"en_US")))
            cm, args = self._method(conn)
            assert cm == CONN_START_OK
            # client-properties table, then mechanism shortstr + sasl
            tlen = struct.unpack(">I", args[:4])[0]
            rest = args[4 + tlen:]
            mlen = rest[0]
            mech = rest[1:1 + mlen].decode()
            rest = rest[1 + mlen:]
            slen = struct.unpack(">I", rest[:4])[0]
            sasl = rest[4:4 + slen]
            _, user, password = sasl.split(b"\x00")
            self.auth.append((mech, user.decode(), password.decode()))
            write_frame(conn, FRAME_METHOD, 0, method_frame(
                CONN_TUNE, struct.pack(">HIH", 0, 131072, 0)))
            cm, _ = self._method(conn)
            assert cm == CONN_TUNE_OK
            cm, _ = self._method(conn)
            assert cm == CONN_OPEN
            write_frame(conn, FRAME_METHOD, 0, method_frame(
                CONN_OPEN_OK, shortstr("")))
            cm, _ = self._method(conn)
            assert cm == CHAN_OPEN
            write_frame(conn, FRAME_METHOD, 1, method_frame(
                CHAN_OPEN_OK, longstr(b"")))
            while True:
                cm, args = self._method(conn)
                if cm == QUEUE_DECLARE:
                    qlen = args[2]
                    queue = args[3:3 + qlen].decode()
                    bits = args[3 + qlen]
                    self.declares.append(
                        {"queue": queue, "durable": bool(bits & 0b00010)})
                    write_frame(conn, FRAME_METHOD, 1, method_frame(
                        QUEUE_DECLARE_OK, shortstr(queue)
                        + struct.pack(">II", 0, 0)))
                elif cm == BASIC_PUBLISH:
                    xlen = args[2]
                    rest = args[3 + xlen:]
                    rlen = rest[0]
                    routing = rest[1:1 + rlen].decode()
                    ftype, _, header = read_frame(conn)
                    assert ftype == FRAME_HEADER
                    klass, _w, size, flags = struct.unpack(">HHQH",
                                                           header[:14])
                    dmode = header[14] if flags & (1 << 12) else None
                    ftype, _, body = read_frame(conn)
                    assert ftype == FRAME_BODY and len(body) == size
                    self.publishes.append(
                        {"routing_key": routing, "delivery_mode": dmode,
                         "body": json.loads(body), "class": klass})
                elif cm == CONN_CLOSE:
                    write_frame(conn, FRAME_METHOD, 0,
                                method_frame(CONN_CLOSE_OK))
                    conn.close()
                    return
        except (ConnectionError, AssertionError, OSError):
            conn.close()

    @staticmethod
    def _method(conn):
        ftype, _, payload = read_frame(conn)
        assert ftype == FRAME_METHOD
        return parse_method(payload)


@pytest.fixture()
def broker():
    b = FakeBroker()
    yield b
    b.close()


# -- REST adapter tests -------------------------------------------------------


def test_create_apartment_payload_is_reference_exact(rest):
    srv, api = rest
    c = BackendClient(api)
    apt = c.create_apartment(OFFER)
    assert apt == 101
    path, payload = srv.calls[-1]
    assert path == "/api/apartments"
    assert payload["source_website"] == "otodom"
    assert payload["source_id"] == "otodom-123"
    assert payload["source_url"] == "https://example.test/o/123"
    assert payload["price"] == 499000.0
    assert payload["currency"] == "PLN"
    assert payload["room_num"] == 3
    assert payload["footage"] == 50.0
    assert payload["price_per_m2"] == 9980.0
    assert payload["city"] == "Gdańsk"
    assert payload["geolocation"] == {"lat": 54.35, "lng": 18.65}
    assert len(payload["description"]) == 5000  # [:5000] truncation
    for k in ("photo_attractiveness", "student_attractiveness",
              "family_attractiveness", "single_attractiveness",
              "dog_owner_attractiveness", "universal_attractiveness"):
        assert payload[k] == 0
    for k in ("poi_desc", "price_desc", "size_desc"):
        assert payload[k] is None


def test_create_blocks_zero_price_without_a_wire_call(rest):
    srv, api = rest
    c = BackendClient(api)
    assert c.create_apartment({**OFFER, "price_amount": 0.0}) is False
    assert c.create_apartment({**OFFER, "price_amount": None}) is False
    assert srv.calls == []


def test_duplicate_check_window_and_both_response_shapes(rest):
    srv, api = rest
    c = BackendClient(api)
    assert c.check_duplicate(OFFER) is False
    _, payload = srv.calls[-1]
    assert payload == {
        "center": {"lat": 54.35, "lng": 18.65}, "radius_m": 50,
        "price_min": 498900.0, "price_max": 499100.0,
        "footage_min": 49.0, "footage_max": 51.0, "limit": 1}
    srv.dup_response = {"has_matches": True}
    assert c.check_duplicate(OFFER) is True
    srv.dup_response = [{"id": 7}]
    assert c.check_duplicate(OFFER) is True
    assert c.find_apartment_id(OFFER) == 7
    srv.dup_response = {"matches": [{"id": 9}]}
    assert c.find_apartment_id(OFFER) == 9
    # missing key fields skip the wire entirely (backend.py:28-30)
    n = len(srv.calls)
    assert c.check_duplicate({**OFFER, "lat": None}) is False
    assert c.find_apartment_id({**OFFER, "area_m2": None}) is None
    assert len(srv.calls) == n


def test_upload_photo_sends_link_payload(rest):
    srv, api = rest
    c = BackendClient(api)
    assert c.upload_photo(44, "https://img.test/1.jpg") is True
    assert srv.calls[-1] == ("/api/photos", {
        "apartment_id": 44, "link": "https://img.test/1.jpg",
        "style": "other"})


# -- AMQP publisher tests -----------------------------------------------------


def test_amqp_publish_full_handshake(broker):
    p = AmqpPublisher(host="127.0.0.1", port=broker.port,
                      user="rabbit_user", password="s3cret")
    assert p.publish("scraper_new_offers", {"apartment_id": 42}) is True
    assert broker.auth == [("PLAIN", "rabbit_user", "s3cret")]
    assert broker.declares == [
        {"queue": "scraper_new_offers", "durable": True}]
    assert broker.publishes == [{
        "routing_key": "scraper_new_offers", "delivery_mode": 2,
        "body": {"apartment_id": 42}, "class": 60}]


def test_amqp_publish_swallows_dead_broker():
    p = AmqpPublisher(host="127.0.0.1", port=1, timeout_s=0.2)
    assert p.publish("q", {"apartment_id": 1}) is False


# -- the Ray sink stage -------------------------------------------------------


def test_uploader_stage_end_to_end(rest, broker, ray_session):
    """Offers + photos through the full actor-pool sink: dedup-checked,
    created, photos uploaded per offer, notification per created id."""
    import ray.data as rd

    srv, api = rest
    offers = rd.from_items([
        {**OFFER, "offer_id": f"o{i}",
         "url": f"https://example.test/o/{i}",
         "lat": 54.0 + i * 0.01}
        for i in range(6)
    ])
    photos = rd.from_items(
        [{"offer_id": f"o{i}", "seq": s, "url": f"https://img.test/{i}/{s}"}
         for i in range(4) for s in range(2)])
    res = upload_offers(offers, photos, api,
                        notify={"host": "127.0.0.1", "port": broker.port},
                        concurrency=2, batch_size=4).take_all()
    assert len(res) == 6
    by_id = {r["offer_id"]: r for r in res}
    created = {r["apartment_id"] for r in res}
    assert all(a > 0 for a in created) and len(created) == 6
    for i in range(4):
        assert by_id[f"o{i}"]["photos_sent"] == 2
    for i in range(4, 6):
        assert by_id[f"o{i}"]["photos_sent"] == 0
    assert all(r["notified"] for r in res)
    # wire audit: one create per offer, photos carry backend ids + links
    creates = [p for path, p in srv.calls if path == "/api/apartments"]
    assert len(creates) == 6
    photo_calls = [p for path, p in srv.calls if path == "/api/photos"]
    assert len(photo_calls) == 8
    assert {p["style"] for p in photo_calls} == {"other"}
    assert len(broker.publishes) == 6
    assert ({p["body"]["apartment_id"] for p in broker.publishes}
            == created)


def test_uploader_skips_duplicates(rest, ray_session):
    import ray.data as rd

    srv, api = rest
    srv.dup_response = {"has_matches": True}
    res = upload_offers(rd.from_items([dict(OFFER)]), None, api,
                        concurrency=1, batch_size=8).take_all()
    assert res == [{"offer_id": "otodom-123", "duplicate": True,
                    "apartment_id": -1, "photos_sent": 0,
                    "notified": False}]
    assert [path for path, _ in srv.calls] == [
        "/api/apartments/duplicates/check"]


def test_uploader_without_broker_and_photos(rest, ray_session):
    import ray.data as rd

    srv, api = rest
    up = BackendUploader(api_url=api)
    import pyarrow as pa
    out = up(pa.Table.from_pylist([dict(OFFER)]))
    assert out["apartment_id"][0].as_py() > 0
    assert out["notified"][0].as_py() is False
