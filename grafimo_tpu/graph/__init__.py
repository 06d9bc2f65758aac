from grafimo_tpu.graph.sitegraph import Site, SiteGraph, build_graph  # noqa: F401
from grafimo_tpu.graph.haplo import HaploIndex  # noqa: F401
from grafimo_tpu.graph.enumerate import enumerate_region_windows  # noqa: F401
