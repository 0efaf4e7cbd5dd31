from sdumc_tpu.serve.export import (  # noqa: F401
    ServingBundle, export_dual_view_eval, load_exported)
