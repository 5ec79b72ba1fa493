"""Shared test scaffold: the "Example API" hyper-schema and data sample.

This is the same fixture shape the reference test-suite mutates in place
(reference: test/data_scaffold.rb:2-240) — a Heroku-style hyper-schema with
an ``app`` definition exercising every keyword. Fresh copies per test via
``schema_sample()`` / ``data_sample()``.
"""

from __future__ import annotations

import copy

_DATA_SAMPLE = {"name": "cloudnasium"}

_SCHEMA_SAMPLE = {
    "$schema": "http://json-schema.org/draft-04/hyper-schema",
    "title": "Example API",
    "description": "An example API.",
    "type": ["object"],
    "definitions": {
        "app": {
            "$schema": "http://json-schema.org/draft-04/hyper-schema",
            "title": "App",
            "description": "An app.",
            "id": "schemata/app",
            "type": ["object"],
            "definitions": {
                "config_vars": {
                    "patternProperties": {
                        "^\\w+$": {
                            "type": ["null", "string"],
                        },
                    },
                },
                "contrived": {
                    "allOf": [
                        {"maxLength": 30},
                        {"minLength": 3},
                    ],
                    "anyOf": [
                        {"minLength": 3},
                        {"minLength": 5},
                    ],
                    "oneOf": [
                        {"pattern": "^(foo|aaa)$"},
                        {"pattern": "^(foo|zzz)$"},
                    ],
                    "not": {"pattern": "^$"},
                },
                "contrived_plus": {
                    "allOf": [
                        {"$ref": "/schemata/app#/definitions/contrived/allOf/0"},
                        {"$ref": "/schemata/app#/definitions/contrived/allOf/1"},
                    ],
                    "anyOf": [
                        {"$ref": "/schemata/app#/definitions/contrived/anyOf/0"},
                        {"$ref": "/schemata/app#/definitions/contrived/anyOf/1"},
                    ],
                    "oneOf": [
                        {"$ref": "/schemata/app#/definitions/contrived/oneOf/0"},
                        {"$ref": "/schemata/app#/definitions/contrived/oneOf/1"},
                    ],
                    "not": {"$ref": "/schemata/app#/definitions/contrived/not"},
                },
                "cost": {
                    "description": "running price of an app",
                    "example": 35.01,
                    "maximum": 1000.0,
                    "exclusiveMaximum": True,
                    "minimum": 0.0,
                    "exclusiveMinimum": False,
                    "multipleOf": 0.01,
                    "readOnly": False,
                    "type": ["number"],
                },
                "flags": {
                    "description": "flags for an app",
                    "example": ["websockets"],
                    "items": {
                        "pattern": "^[a-z][a-z\\-]*[a-z]$",
                    },
                    "maxItems": 10,
                    "minItems": 1,
                    "readOnly": False,
                    "type": ["array"],
                    "uniqueItems": True,
                },
                "id": {
                    "description": "integer identifier of an app",
                    "example": 1,
                    "maximum": 10000,
                    "exclusiveMaximum": False,
                    "minimum": 0,
                    "exclusiveMinimum": True,
                    "multipleOf": 1,
                    "readOnly": True,
                    "type": ["integer"],
                },
                "identity": {
                    "anyOf": [
                        {"$ref": "/schemata/app#/definitions/id"},
                        {"$ref": "/schemata/app#/definitions/name"},
                    ],
                },
                "name": {
                    "default": "hello-world",
                    "description": "unique name of app",
                    "example": "name",
                    "maxLength": 30,
                    "minLength": 3,
                    "pattern": "^[a-z][a-z0-9-]{3,30}$",
                    "readOnly": False,
                    "type": ["string"],
                },
                "owner": {
                    "description": "owner of the app",
                    "format": "email",
                    "example": "dwarf@example.com",
                    "readOnly": False,
                    "type": ["string"],
                },
                "production": {
                    "description": "whether this is a production app",
                    "example": False,
                    "readOnly": False,
                    "type": ["boolean"],
                },
                "role": {
                    "description": "name of a role on an app",
                    "example": "collaborator",
                    "readOnly": True,
                    "type": ["string"],
                },
                "roles": {
                    "additionalProperties": True,
                    "patternProperties": {
                        "^\\w+$": {
                            "$ref": "/schemata/app#/definitions/role",
                        },
                    },
                },
                "ssl": {
                    "description": "whether this app has SSL termination",
                    "example": False,
                    "readOnly": False,
                    "type": ["boolean"],
                },
                "visibility": {
                    "description": "the visibility of the app",
                    "enum": ["private", "public"],
                    "example": False,
                    "readOnly": False,
                    "type": ["string"],
                },
            },
            "properties": {
                "config_vars": {
                    "$ref": "/schemata/app#/definitions/config_vars",
                },
                "contrived": {
                    "$ref": "/schemata/app#/definitions/contrived",
                },
                "cost": {
                    "$ref": "/schemata/app#/definitions/cost",
                },
                "flags": {
                    "$ref": "/schemata/app#/definitions/flags",
                },
                "id": {
                    "$ref": "/schemata/app#/definitions/id",
                },
                "name": {
                    "$ref": "/schemata/app#/definitions/name",
                },
                "owner": {
                    "$ref": "/schemata/app#/definitions/owner",
                },
                "production": {
                    "$ref": "/schemata/app#/definitions/production",
                },
                "ssl": {
                    "$ref": "/schemata/app#/definitions/ssl",
                },
                "visibility": {
                    "$ref": "/schemata/app#/definitions/visibility",
                },
            },
            "additionalProperties": False,
            "dependencies": {
                "production": "ssl",
                "ssl": {
                    "properties": {
                        "cost": {
                            "minimum": 20.0,
                        },
                        "name": {
                            "$ref": "/schemata/app#/definitions/name",
                        },
                    },
                },
            },
            "maxProperties": 10,
            "minProperties": 1,
            "required": ["name"],
            "links": [
                {
                    "description": "Create a new app.",
                    "href": "/apps",
                    "method": "POST",
                    "rel": "create",
                    "schema": {
                        "properties": {
                            "name": {
                                "$ref": "#/definitions/app/definitions/name",
                            },
                        },
                    },
                    "targetSchema": {
                        "$ref": "#/definitions/app",
                    },
                },
            ],
            "media": {
                "type": "application/json",
            },
            "pathStart": "/",
            "readOnly": False,
        },
    },
    "properties": {
        "app": {
            "$ref": "#/definitions/app",
        },
    },
    "links": [
        {
            "href": "http://example.com",
            "rel": "self",
        },
    ],
}


def data_sample() -> dict:
    return copy.deepcopy(_DATA_SAMPLE)


def schema_sample() -> dict:
    return copy.deepcopy(_SCHEMA_SAMPLE)


def pointer(root: dict, path: str) -> dict:
    """Mutable JSON-pointer access into a dict tree (test helper, mirrors the
    reference suite's ``pointer(...)`` mutation idiom)."""
    from json_schema_spark.pointer import evaluate

    return evaluate(root, path)
