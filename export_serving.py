"""Root entry point for serving export (see recurrent_flows_tpu/cli)."""

from recurrent_flows_tpu.cli.export_serving import main

if __name__ == "__main__":
    main()
