"""Shared fixture documents — the students/movies corpus from the
reference's end-to-end example
(/root/reference/morph-xr2rml-dist/example_mongo/testdb_dump.json), with
explicit _id ObjectIds matching the reference's golden output subjects
(result1.txt:7,30,52)."""

import json

STUDENTS = [
    {"_id": {"$oid": "547f2a2b31f7a44bec07b21f"},
     "FullName": {"FirstNames": ["Paul", "Jack"], "LastName": "Smith"},
     "Hobbies": [{"hobby": "Swimming", "place": "pool"},
                 {"hobby": "Calcio", "place": "stadium", "lang": "it"}]},
    {"_id": {"$oid": "547f2a2b31f7a44bec07b220"},
     "FullName": {"FirstNames": ["Frank", "Francis"], "LastName": "Underwood"},
     "Hobbies": [{"hobby": "Hiking", "place": "Mountain"},
                 {"hobby": "Basketball", "place": "street", "lang": "fr"}]},
    {"_id": {"$oid": "547f2a2b31f7a44bec07b221"},
     "FullName": {"FirstNames": ["Weirdo", '#{[|`^@]"'], "LastName": "Foo"},
     "id": 13, "active": False},
]

MOVIES = [
    {"directors": [
        {"name": "Wong Kar-wai",
         "movies": ["2046", "In the Mood for Love", "The Grandmaster"]},
        {"name": "Woody Allen", "movies": ["Manhattan", "Annie Hall"]}]},
    {"movies": [
        {"title": "Manhattan", "year": "1979"},
        {"title": "Annie Hall", "year": "1977"},
        {"title": "2046", "year": "2004"},
        {"title": "In the Mood for Love", "year": "2000"},
        {"title": "West Side Story", "year": "1962"}]},
]

STUDENTS_JSON = [json.dumps(d) for d in STUDENTS]
MOVIES_JSON = [json.dumps(d) for d in MOVIES]

MAPPING1_PATH = "/root/reference/morph-xr2rml-dist/example_mongo/mapping1.ttl"
