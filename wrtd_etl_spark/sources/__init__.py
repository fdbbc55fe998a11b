"""Ingest sources: nested-JSON documents and scraped HTML pages."""

from .html_page import parse_listing, parse_replay_page
from .json_ingest import flatten_frags, flatten_players, flatten_vehicles, parse_replay_json

__all__ = [
    "parse_replay_json",
    "flatten_vehicles",
    "flatten_players",
    "flatten_frags",
    "parse_listing",
    "parse_replay_page",
]
