"""Root entry point: python main_svg.py ... (see recurrent_flows_tpu/cli)."""

from recurrent_flows_tpu.cli.main_svg import main

if __name__ == "__main__":
    main()
