from sdumc_tpu.serve.export import (  # noqa: F401
    DecodeBundle, ServingBundle, export_beam_decode,
    export_dual_view_eval, load_exported)
