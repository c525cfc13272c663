"""Root entry point for offline evaluation (see recurrent_flows_tpu/cli)."""

from recurrent_flows_tpu.cli.eval_settings import main

if __name__ == "__main__":
    main()
