"""API-surface parity: ChunkedExtractor (SRC2), event-driven extraction
(SRC4), candidate-subtree event replay (O6)."""

from __future__ import annotations

from readabilitysax_spark.core.api import extract
from readabilitysax_spark.core.readability import Readability
from readabilitysax_spark.core.stream_api import (
    ChunkedExtractor,
    extract_from_events,
    get_events,
)
from readabilitysax_spark.core.tokenizer import replay, tokenize

SETTINGS = {"pageURL": "http://howtonode.org/heat-tracer/", "resolvePaths": True}


def test_chunked_extractor_matches_whole_input(testpage):
    w = ChunkedExtractor(dict(SETTINGS))
    data = testpage.encode("utf-8")
    # byte chunks that split multi-byte boundaries are fine: the
    # extractor concatenates before decoding (like the reference)
    for i in range(0, len(data), 1013):
        w.write(data[i : i + 1013])
    art = w.finish()
    whole = extract(testpage, url=SETTINGS["pageURL"],
                    settings={"resolvePaths": True})
    assert art["text"] == whole["text"]
    assert art["textLength"] == 7935 and art["score"] == 82


def test_chunked_extractor_str_chunks():
    w = ChunkedExtractor()
    w.write("<div class='content'>")
    w.write("<p>" + "chunked, input works here " * 12 + "</p>")
    w.write("</div>")
    art = w.finish()
    assert art["textLength"] > 250 and art["skipLevel"] == 0


def test_extract_from_events_matches_tokenizer_path(testpage):
    events = tokenize(testpage)
    via_events = extract_from_events(events, dict(SETTINGS))
    direct = extract(testpage, url=SETTINGS["pageURL"],
                     settings={"resolvePaths": True})
    assert via_events["text"] == direct["text"]
    assert via_events["textLength"] == direct["textLength"] == 7935


def test_get_events_roundtrip(testpage):
    r = Readability(dict(SETTINGS))
    replay(tokenize(testpage), r)
    r.get_article()

    seen = {"open": 0, "text": [], "close": 0}

    class CB:
        def onopentag(self, name, attrs):
            seen["open"] += 1

        def ontext(self, text):
            seen["text"].append(text)

        def onclosetag(self, name):
            seen["close"] += 1

    get_events(r, CB())
    assert seen["open"] == seen["close"] > 10
    assert "System Requirements" in "".join(seen["text"])
