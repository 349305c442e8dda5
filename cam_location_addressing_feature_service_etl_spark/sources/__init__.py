"""Connector-shaped helpers: SPARQL binding flattening, ESRI paged
source planning, snapshot lifecycle. Network I/O is isolated behind
fetcher callables so everything is testable offline (the reference's
tests substitute fixtures the same way, SURVEY §5)."""
