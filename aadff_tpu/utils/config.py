"""YAML config loading with the reference's schema.

The reference parses configs with `yaml.load(FullLoader)` and relies on the
`!!python/tuple` tag for the resolution field
(configs/aber_aware_dff_aif.yml:25).  We accept the same files with a safe
constructor for that tag only — no arbitrary python object instantiation.
"""
from __future__ import annotations

import yaml


class _RefLoader(yaml.SafeLoader):
    pass


_RefLoader.add_constructor(
    "tag:yaml.org,2002:python/tuple",
    lambda loader, node: tuple(loader.construct_sequence(node)),
)


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.load(f, Loader=_RefLoader)
