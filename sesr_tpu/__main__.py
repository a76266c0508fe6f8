from sesr_tpu.cli import main

main()
