from .events import (  # noqa: F401
    EVENT_WIRE_SCHEMA,
    EVENTS_TABLE_SCHEMA,
    normalize_events,
    parse_wire_events,
    read_events,
    read_events_stream,
)
