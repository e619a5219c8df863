from ljmd_tpu.cli import main

raise SystemExit(main())
