"""Root entry point: python main_rfn.py ... (see recurrent_flows_tpu/cli)."""

from recurrent_flows_tpu.cli.main_rfn import main

if __name__ == "__main__":
    main()
