"""Root entry point: python main_srnn.py ... (see recurrent_flows_tpu/cli)."""

from recurrent_flows_tpu.cli.main_srnn import main

if __name__ == "__main__":
    main()
