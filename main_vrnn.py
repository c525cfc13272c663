"""Root entry point: python main_vrnn.py ... (see recurrent_flows_tpu/cli)."""

from recurrent_flows_tpu.cli.main_vrnn import main

if __name__ == "__main__":
    main()
