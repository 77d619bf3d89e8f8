from pita_tpu.io.logging import CSVLogger, MultiLogger, ConsoleLogger, make_logger
