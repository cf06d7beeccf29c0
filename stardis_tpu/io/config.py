"""Configuration system: YAML + jsonschema draft-04 validation with default
injection and dotted-path overrides.

Mirrors the reference's config surface (reference io/base.py:20-65 +
io/schemas/*.yml): same keys, same defaults, same validation semantics.
The schema lives here as Python data instead of $ref-composed YAML files —
one document, same draft-04 dialect, validated with the jsonschema package.
"""

from __future__ import annotations

import copy

import jsonschema
import yaml

LINE_SCHEMA = {
    "type": "object",
    "additionalProperties": False,
    "properties": {
        "disable": {"type": "boolean", "default": False},
        "broadening": {
            "type": "array",
            "items": {
                "enum": [
                    "linear_stark",
                    "quadratic_stark",
                    "van_der_waals",
                    "radiation",
                ]
            },
            "default": [],
        },
        "disable_microturbulence": {"type": "boolean", "default": False},
        "vald_linelist": {
            "type": "object",
            "default": {},
            "properties": {
                "use_linelist": {"type": "boolean", "default": False},
                "shortlist": {"type": "boolean", "default": False},
                "use_vald_broadening": {"type": "boolean", "default": True},
                # extension over the reference (whose schema notes the
                # linelist "cannot be supplied separately"): path to a raw
                # VALD3 text export, parsed by the native C++ reader
                "fname": {"type": ["string", "null"], "default": None},
            },
        },
        "include_molecules": {"type": "boolean", "default": False},
        # extension over the reference: solve the molecular network
        # COUPLED (shared constituent reservoirs deplete consistently;
        # fixes orders-of-magnitude C2/CH/CN inflation below ~4000 K)
        # instead of the reference's independent per-molecule quadratics.
        # Validated envelope: 2500-10000 K, rho <= 1e-5 g/cm^3 (pinned
        # against Korg.jl in tests/test_korg_parity.py); the fixed
        # 400-iteration Jacobi sweep converges to ~1e-11 there, and the
        # host surface (molecule_number_density_frame) warns if the
        # conservation residual exceeds 1e-6 outside it
        "molecules_coupled": {"type": "boolean", "default": False},
        "window_mode": {
            "enum": ["reference", "accuracy"],
            "default": "reference",
        },
        "window_epsilon": {"type": "number", "default": 1e-4},
        # depth-block size for window tiering; 0 = per-line tiers
        # (read by pipeline.build_simulation_plan)
        "window_block": {"type": "number", "multipleOf": 1, "default": 8},
    },
}

OPACITY_SCHEMA = {
    "type": "object",
    "additionalProperties": False,
    "properties": {
        "file": {
            "type": "object",
            "default": {},
            "additionalProperties": False,
            "patternProperties": {"_bf$": {"type": "string"}, "_ff$": {"type": "string"}},
        },
        "bf": {
            "type": "object",
            "default": {},
            "additionalProperties": {
                "type": "object",
                "additionalProperties": False,
                "properties": {
                    "gaunt": {"type": ["string", "null"], "default": None},
                    "departure": {"type": ["string", "null"], "default": None},
                },
            },
        },
        "ff": {
            "type": "object",
            "default": {},
            "additionalProperties": {
                "type": "object",
                "additionalProperties": False,
                "properties": {
                    "gaunt": {"type": ["string", "null"], "default": None},
                    "departure": {"type": ["string", "null"], "default": None},
                },
            },
        },
        "rayleigh": {
            "type": "array",
            "default": [],
            "items": {"enum": ["H", "He", "H2"]},
        },
        "disable_electron_scattering": {"type": "boolean", "default": False},
        "line": {**LINE_SCHEMA, "default": {}},
    },
}

INPUT_MODEL_SCHEMA = {
    "type": "object",
    "properties": {
        "type": {"enum": ["marcs", "mesa"]},
        "fname": {"type": "string"},
        "gzipped": {"type": "boolean", "default": False},
        "final_atomic_number": {"type": "number", "multipleOf": 1, "default": 92},
        "truncate_to_shell": {"type": "number", "multipleOf": 1, "default": -99},
        "composition_source": {"type": "string", "default": "from_model"},
        "composition_Y": {"type": "number", "default": -99.0},
        "composition_Z": {"type": "number", "default": -99.0},
        "nuclide_rescaling_dict": {"type": "object", "default": {}},
    },
    "required": ["type", "fname"],
}

RESULT_OPTIONS_SCHEMA = {
    "type": "object",
    "additionalProperties": False,
    "properties": {
        "return_model": {"type": "boolean", "default": False},
        "return_plasma": {"type": "boolean", "default": False},
        "return_radiation_field": {"type": "boolean", "default": False},
    },
}

CONFIG_SCHEMA = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "type": "object",
    "properties": {
        "stardis_config_version": {"enum": [1.0]},
        "n_threads": {"type": "number", "multipleOf": 1, "default": 1},
        "atom_data": {"type": "string"},
        "input_model": INPUT_MODEL_SCHEMA,
        "opacity": OPACITY_SCHEMA,
        "no_of_thetas": {"type": "number", "multipleOf": 1, "default": 10},
        "result_options": {**RESULT_OPTIONS_SCHEMA, "default": {}},
    },
    "required": ["stardis_config_version", "atom_data", "input_model", "opacity"],
}


def _inject_defaults(schema, value):
    """Recursively apply schema defaults to a config dict."""
    if schema.get("type") == "object" and isinstance(value, dict):
        props = schema.get("properties", {})
        for key, sub in props.items():
            if key not in value and "default" in sub:
                value[key] = copy.deepcopy(sub["default"])
            if key in value:
                _inject_defaults(sub, value[key])
        extra = schema.get("additionalProperties")
        if isinstance(extra, dict):
            for key, v in value.items():
                if key not in props:
                    _inject_defaults(extra, v)
    return value


class Configuration:
    """Nested attribute access over a config dict, with dotted-path
    overrides (reference io/base.py:53-65)."""

    def __init__(self, data: dict):
        self._data = data

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            val = self._data[name]
        except KeyError as exc:
            raise AttributeError(name) from exc
        return Configuration(val) if isinstance(val, dict) else val

    def __getitem__(self, name):
        return getattr(self, name)

    def __contains__(self, name):
        return name in self._data

    def __iter__(self):
        return iter(self._data)

    def items(self):
        return self._data.items()

    def keys(self):
        return self._data.keys()

    def get(self, name, default=None):
        val = self._data.get(name, default)
        return Configuration(val) if isinstance(val, dict) else val

    def to_dict(self):
        return copy.deepcopy(self._data)

    def set_config_item(self, dotted_key, value):
        parts = dotted_key.split(".")
        node = self._data
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def __repr__(self):
        return f"Configuration({self._data!r})"


def validate_config_dict(config_dict):
    jsonschema.validate(
        config_dict,
        CONFIG_SCHEMA,
        cls=jsonschema.validators.Draft4Validator,
    )
    return _inject_defaults(CONFIG_SCHEMA, config_dict)


def load_config(config_fname, add_config_dict=None):
    """Read + validate a STARDIS YAML config; apply dotted-key overrides."""
    with open(config_fname) as fh:
        config_dict = yaml.safe_load(fh)
    try:
        config_dict = validate_config_dict(config_dict)
    except jsonschema.ValidationError as exc:
        raise ValueError(
            f"Config failed to validate: {exc.message}"
        ) from exc
    config = Configuration(config_dict)
    if add_config_dict:
        for key, val in add_config_dict.items():
            if not isinstance(key, str):
                raise ValueError(f"{key} not a valid type. Should be a string.")
            config.set_config_item(key, val)
        try:
            validate_config_dict(config._data)
        except jsonschema.ValidationError as exc:
            raise ValueError(
                f"Additional config keys/values failed to validate: {exc.message}"
            ) from exc
    return config
