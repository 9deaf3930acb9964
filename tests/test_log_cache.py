"""Logging/CHECK/LRU-cache layer (util/logging.h:37-64, util/cache.h)."""

import logging

import pytest

from cvt_tpu.utils.log import (CheckError, LRUCache, check, check_eq,
                               check_gt, check_le, check_option,
                               init_logging)


def test_check_family():
    check(True)
    check_eq(3, 3)
    check_le(2, 2)
    check_gt(5, 4)
    with pytest.raises(CheckError):
        check(False, "bad %d", 7)
    with pytest.raises(CheckError, match="4 vs 5"):
        check_eq(4, 5)
    with pytest.raises(CheckError):
        check_gt(1, 1)


def test_check_option_returns_bool(caplog):
    assert check_option(True, "x > 0")
    with caplog.at_level(logging.ERROR, logger="cvt_tpu"):
        assert not check_option(False, "x > 0")
    assert "x > 0" in caplog.text


def test_lru_cache_loader_and_eviction():
    loads = []

    def getter(k):
        loads.append(k)
        return k * 10

    c = LRUCache(2, getter)
    assert c.get(1) == 10
    assert c.get(2) == 20
    assert c.get(1) == 10            # hit, no reload
    assert loads == [1, 2]
    c.get(3)                         # evicts 2 (1 was touched later)
    assert 2 not in c
    assert 1 in c
    c.get(2)
    assert loads == [1, 2, 3, 2]
    assert c.hits == 1
    assert len(c) == 2


def test_lru_cache_no_loader():
    c = LRUCache(4)
    with pytest.raises(KeyError):
        c.get("missing")
    c.set("a", 1)
    assert c.get("a") == 1
    assert c.pop("a") == 1
    assert c.pop("a") is None


def test_init_logging_idempotent(capsys):
    lg = init_logging()
    n = len(lg.handlers)
    assert init_logging() is lg
    assert len(lg.handlers) == n
