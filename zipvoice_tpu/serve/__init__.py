"""Production serving layer (beyond the reference, which only ships batch
CLIs — ref zipvoice/bin/infer_zipvoice.py): an HTTP server with dynamic
request batching over the jitted sampling programs.

See serve/server.py and bin/serve.py.
"""

from zipvoice_tpu.serve.server import DynamicBatcher, TTSServer  # noqa: F401
