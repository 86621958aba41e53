"""JSON-Schema normalization + field-prompt rendering + validation for the
LLM extraction path (``json_options``).

Ports (logic-for-logic) from the reference:

- ``remove_default_property`` / ``normalize_schema``:
  packages/ai/src/agents/LLMExtract.ts:9-70 — strip ``default`` keys
  recursively, wrap a bare array schema in ``{items: ...}``, promote a
  type-less property bag to an object schema with every key required, then
  enforce ``additionalProperties: false`` on every object node;
- ``create_field_prompt``: LLMExtract.ts:177-206 — the indented field list
  embedded in the extraction prompt;
- ``validate_against_schema``: the acceptance check the reference delegates
  to the ``ai`` SDK's ``jsonSchema`` validation (generateObject rejects
  non-conforming output) — implemented here directly for the normalized
  subset the extractor emits (type/properties/required/items/
  additionalProperties/enum).
"""

from __future__ import annotations

from typing import Any


def remove_default_property(obj: Any) -> Any:
    """Recursively drop every ``default`` key (LLMExtract.ts:9-19)."""
    if isinstance(obj, list):
        return [remove_default_property(v) for v in obj]
    if isinstance(obj, dict):
        return {k: remove_default_property(v)
                for k, v in obj.items() if k != "default"}
    return obj


def _enforce_additional_false(node: Any) -> Any:
    if not isinstance(node, (dict, list)):
        return node
    if isinstance(node, list):
        return [_enforce_additional_false(v) for v in node]
    out = dict(node)
    if out.get("type") == "object":
        if "additionalProperties" not in out:
            out["additionalProperties"] = False
        props = out.get("properties")
        if isinstance(props, dict):
            out["properties"] = {k: _enforce_additional_false(v)
                                 for k, v in props.items()}
    elif out.get("type") == "array" and out.get("items"):
        out["items"] = _enforce_additional_false(out["items"])
    return out


def normalize_schema(schema: Any) -> Any:
    """LLMExtract.ts:21-70 ``normalizeSchema``.

    1. strip defaults; 2. wrap a top-level array schema as
    ``{type: object, properties: {items: <array>}, required: [items]}``;
    3. a type-less dict is treated as a property bag -> object schema with
    ALL keys required (each value normalized recursively); 4. every object
    node gets ``additionalProperties: false`` unless explicitly set.
    """
    no_defaults = remove_default_property(schema)
    if isinstance(no_defaults, dict) and no_defaults.get("type") == "array":
        base: Any = {
            "type": "object",
            "properties": {"items": no_defaults},
            "required": ["items"],
            "additionalProperties": False,
        }
    elif isinstance(no_defaults, dict) and "type" not in no_defaults:
        base = {
            "type": "object",
            "properties": {k: normalize_schema(v)
                           for k, v in no_defaults.items()},
            "required": list(no_defaults.keys()),
            "additionalProperties": False,
        }
    else:
        base = no_defaults
    return _enforce_additional_false(base)


def create_field_prompt(schema: Any, indent: str = "") -> str:
    """LLMExtract.ts:177-206 ``createFieldPrompt`` — indented field list."""
    if not isinstance(schema, dict):
        return ""
    props = schema.get("properties")
    if not isinstance(props, dict) or not props:
        return ""
    lines: list[str] = []
    for field, prop in props.items():
        prop = prop if isinstance(prop, dict) else {}
        ftype = prop.get("type") or "any"
        description = prop.get("description") or ""
        if ftype == "array":
            items = prop.get("items")
            item_type = (items.get("type") if isinstance(items, dict) and
                         "type" in items else "any")
            type_desc = f"(array of {item_type}s)"
            if isinstance(items, dict) and items.get("type") == "object":
                lines.append(
                    f"{indent}- {field} {type_desc}: {description}\n"
                    + create_field_prompt(items, indent + "    "))
                continue
        elif ftype == "object":
            type_desc = "(object)"
            lines.append(f"{indent}- {field} {type_desc}: {description}\n"
                         + create_field_prompt(prop, indent + "    "))
            continue
        else:
            type_desc = f"({ftype})"
        lines.append(f"{indent}- {field} {type_desc}: {description}")
    return "\n".join(lines)


_TYPE_CHECKS = {
    "string": lambda v: isinstance(v, str),
    "number": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
    "integer": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "boolean": lambda v: isinstance(v, bool),
    "null": lambda v: v is None,
    "array": lambda v: isinstance(v, list),
    "object": lambda v: isinstance(v, dict),
}


def validate_against_schema(value: Any, schema: Any, path: str = "$"
                            ) -> list[str]:
    """Validate ``value`` against a (normalized) schema; returns a list of
    error strings, empty when conforming."""
    errors: list[str] = []
    if not isinstance(schema, dict):
        return errors
    stype = schema.get("type")
    if isinstance(stype, list):
        if not any(t in _TYPE_CHECKS and _TYPE_CHECKS[t](value) for t in stype):
            errors.append(f"{path}: expected one of {stype}")
            return errors
        stype = next((t for t in stype
                      if t in _TYPE_CHECKS and _TYPE_CHECKS[t](value)), None)
    elif stype is not None:
        check = _TYPE_CHECKS.get(stype)
        if check is not None and not check(value):
            errors.append(f"{path}: expected {stype}, "
                          f"got {type(value).__name__}")
            return errors
    if "enum" in schema and value not in schema["enum"]:
        errors.append(f"{path}: {value!r} not in enum {schema['enum']}")
    if stype == "object" and isinstance(value, dict):
        props = schema.get("properties") or {}
        for req in schema.get("required", []):
            if req not in value:
                errors.append(f"{path}.{req}: required property missing")
        if schema.get("additionalProperties") is False:
            for k in value:
                if k not in props:
                    errors.append(f"{path}.{k}: additional property "
                                  "not allowed")
        for k, v in value.items():
            if k in props:
                errors.extend(validate_against_schema(v, props[k],
                                                      f"{path}.{k}"))
    elif stype == "array" and isinstance(value, list):
        items = schema.get("items")
        if isinstance(items, dict):
            for i, v in enumerate(value):
                errors.extend(validate_against_schema(v, items,
                                                      f"{path}[{i}]"))
    return errors


# --------------------------------------------------- request-side validation

# BaseSchema.ts:7-18 jsonSchemaType — the REQUEST validation surface is
# stricter than the extractor's normalizer: "type" is required and limited
# to this enum ("integer" is NOT accepted at the API edge)
USER_SCHEMA_TYPES = ("object", "array", "string", "number", "boolean", "null")

_JSON_OPTIONS_KEYS = ("schema", "user_prompt", "schema_name",
                      "schema_description")


def validate_user_schema(schema, path: str = "$") -> list[str]:
    """Validate a user-supplied JSON Schema the way the reference's Zod
    ``jsonSchemaType`` does (BaseSchema.ts:7-18): dict with required
    ``type`` from the enum; ``properties`` a dict of schemas; ``required``
    a list of strings; ``items`` a schema or list of schemas;
    ``description`` a string. Unknown keys pass (the Zod object is not
    strict). Returns error strings; empty = valid."""
    errors: list[str] = []
    if not isinstance(schema, dict):
        return [f"{path}: schema must be an object"]
    stype = schema.get("type")
    if stype not in USER_SCHEMA_TYPES:
        errors.append(f"{path}.type: expected one of {USER_SCHEMA_TYPES}, "
                      f"got {stype!r}")
    props = schema.get("properties")
    if props is not None:
        if not isinstance(props, dict):
            errors.append(f"{path}.properties: must be an object of schemas")
        else:
            for k, v in props.items():
                errors.extend(validate_user_schema(v, f"{path}.properties.{k}"))
    req = schema.get("required")
    if req is not None:
        if not isinstance(req, list) or any(not isinstance(r, str)
                                            for r in req):
            errors.append(f"{path}.required: must be an array of strings")
    items = schema.get("items")
    if items is not None:
        if isinstance(items, list):
            for i, it in enumerate(items):
                errors.extend(validate_user_schema(it, f"{path}.items[{i}]"))
        else:
            errors.extend(validate_user_schema(items, f"{path}.items"))
    desc = schema.get("description")
    if desc is not None and not isinstance(desc, str):
        errors.append(f"{path}.description: must be a string")
    return errors


def validate_json_options(json_options) -> list[str]:
    """BaseSchema.ts:21-33 jsonOptionsSchema (``.strict()``): only the four
    known keys are allowed; ``schema`` (when present) must satisfy
    ``validate_user_schema``."""
    if not isinstance(json_options, dict):
        return ["json_options must be an object"]
    errors = [f"json_options.{k}: unrecognized key"
              for k in json_options if k not in _JSON_OPTIONS_KEYS]
    if "schema" in json_options:
        errors.extend(validate_user_schema(json_options["schema"],
                                           "json_options.schema"))
    for k in ("user_prompt", "schema_name", "schema_description"):
        v = json_options.get(k)
        if v is not None and not isinstance(v, str):
            errors.append(f"json_options.{k}: must be a string")
    return errors

