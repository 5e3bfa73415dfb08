"""Engine configuration — the reference's ``Configuration``
(``core/config.py:168-259``) re-expressed for the wave engine, plus the
Spark-scale knobs (bloom sizing, salting, politeness budget).

Loadable from YAML / TOML / environment with the reference's namespacing:
``scalpel`` section in YAML/TOML, ``SCALPEL_`` prefix in env
(``core/config.py:349-435``).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field, fields
from typing import Callable, Optional

# fake-useragent fallback string — core/config.py:261-276
DEFAULT_USER_AGENT = 'Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/44.0.2403.157 Safari/537.36'


@dataclass(frozen=True)
class CrawlConfig:
    # reference-parity knobs (core/config.py:228-259)
    min_request_delay: int = 0
    max_request_delay: int = 0
    fetch_timeout: float = 5.0
    user_agent: str = DEFAULT_USER_AGENT
    follow_robots_txt: bool = False
    # engine knobs
    link_rule: str = 'all'  # or 'second_contains_page' (reference integration parse)
    max_dispatch_per_host_per_wave: Optional[int] = None  # politeness budget; None = unbounded
    hot_host_threshold: Optional[int] = None  # rows per host that triggers salting
    num_salts: int = 8
    bloom_threshold: int = 4096  # seen rows below which the bloom prefilter is skipped
    max_waves: int = 1000
    checkpoint_dir: Optional[str] = None  # SnapshotStore root; None → temp dir
    item_processors: tuple = ()  # Callable[[DataFrame], DataFrame] transforms, applied in order
    # fetch-stage decorators (core/config.py:248-250): each receives the
    # fetch function (DataFrame -> DataFrame) and returns a wrapped one;
    # applied in order, so the LAST registered runs outermost
    response_middlewares: tuple = ()
    seed: int = 42

    def __post_init__(self):
        if self.min_request_delay < 0 or self.max_request_delay < 0:
            raise ValueError('request delays must be >= 0')  # core/config.py:20-26
        if self.max_request_delay < self.min_request_delay:
            raise ValueError('max_request_delay must be >= min_request_delay')  # core/config.py:29-33
        if self.link_rule not in ('all', 'second_contains_page'):
            raise ValueError(f'unknown link_rule: {self.link_rule}')

    @property
    def request_delay(self) -> float:
        """Reference draws randint(min, max) per call (core/config.py:300-312);
        tests pin min == max for determinism
        (tests/any_io/test_static_spider.py:278) — we draw once, seeded."""
        if self.min_request_delay == self.max_request_delay:
            return float(self.min_request_delay)
        return float(random.Random(self.seed).randint(self.min_request_delay, self.max_request_delay))


_BOOL_TRUE = {'1', 'true', 'yes', 'y', 'on'}
_INT_FIELDS = {'min_request_delay', 'max_request_delay', 'max_dispatch_per_host_per_wave',
               'hot_host_threshold', 'num_salts', 'bloom_threshold', 'max_waves', 'seed'}
_FLOAT_FIELDS = {'fetch_timeout'}
_BOOL_FIELDS = {'follow_robots_txt'}


def _coerce(name: str, value):
    if value is None or not isinstance(value, str):
        return value
    if name in _BOOL_FIELDS:
        return value.strip().lower() in _BOOL_TRUE  # str→bool converter, core/config.py:81-95
    if name in _INT_FIELDS:
        return int(value)
    if name in _FLOAT_FIELDS:
        return float(value)
    return value


def _from_mapping(data: dict) -> CrawlConfig:
    known = {f.name for f in fields(CrawlConfig)}
    kwargs = {k: _coerce(k, v) for k, v in data.items() if k in known}
    return CrawlConfig(**kwargs)


def load_from_yaml(path: str) -> CrawlConfig:
    """YAML file with a ``scalpel`` top-level section (core/config.py:349-376)."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return _from_mapping(data.get('scalpel', {}))


def load_from_toml(path: str) -> CrawlConfig:
    """TOML file with a ``scalpel`` table (core/config.py:378-405)."""
    import tomllib

    with open(path, 'rb') as f:
        data = tomllib.load(f)
    return _from_mapping(data.get('scalpel', {}))


def load_from_env(environ: Optional[dict] = None) -> CrawlConfig:
    """SCALPEL_-prefixed environment variables (core/config.py:407-435)."""
    environ = environ if environ is not None else dict(os.environ)
    data = {k[len('SCALPEL_'):].lower(): v for k, v in environ.items() if k.startswith('SCALPEL_')}
    return _from_mapping(data)
