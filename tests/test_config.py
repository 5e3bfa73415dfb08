"""Configuration loading/validation — reference core/config.py semantics
(validators core/config.py:20-33, loaders :349-435)."""

from __future__ import annotations

import pytest

from scalpel_spark.config import CrawlConfig, load_from_env, load_from_toml, load_from_yaml


def test_delay_validators():
    with pytest.raises(ValueError):
        CrawlConfig(min_request_delay=-1)
    with pytest.raises(ValueError):
        CrawlConfig(min_request_delay=5, max_request_delay=2)
    assert CrawlConfig(min_request_delay=2, max_request_delay=2).request_delay == 2.0


def test_request_delay_seeded_determinism():
    a = CrawlConfig(min_request_delay=1, max_request_delay=10, seed=42)
    b = CrawlConfig(min_request_delay=1, max_request_delay=10, seed=42)
    assert a.request_delay == b.request_delay
    assert 1.0 <= a.request_delay <= 10.0


def test_unknown_link_rule_rejected():
    with pytest.raises(ValueError, match='link_rule'):
        CrawlConfig(link_rule='nope')


def test_load_from_yaml(tmp_path):
    p = tmp_path / 'c.yaml'
    p.write_text('scalpel:\n  min_request_delay: 3\n  max_request_delay: 4\n'
                 '  follow_robots_txt: "yes"\n  user_agent: bot\n')
    cfg = load_from_yaml(str(p))
    assert (cfg.min_request_delay, cfg.max_request_delay) == (3, 4)
    assert cfg.follow_robots_txt is True
    assert cfg.user_agent == 'bot'


def test_load_from_toml(tmp_path):
    p = tmp_path / 'c.toml'
    p.write_text('[scalpel]\nmin_request_delay = 1\nmax_request_delay = 2\nfetch_timeout = 9.5\n')
    cfg = load_from_toml(str(p))
    assert cfg.min_request_delay == 1
    assert cfg.fetch_timeout == 9.5


def test_load_from_env():
    cfg = load_from_env({
        'SCALPEL_MAX_WAVES': '7',
        'SCALPEL_FOLLOW_ROBOTS_TXT': 'true',
        'SCALPEL_USER_AGENT': 'env-bot',
        'UNRELATED': 'x',
    })
    assert cfg.max_waves == 7
    assert cfg.follow_robots_txt is True
    assert cfg.user_agent == 'env-bot'


def test_env_str_to_bool_falsey():
    assert load_from_env({'SCALPEL_FOLLOW_ROBOTS_TXT': 'no'}).follow_robots_txt is False
    assert load_from_env({'SCALPEL_FOLLOW_ROBOTS_TXT': '0'}).follow_robots_txt is False
