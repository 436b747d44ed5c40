from xbitops_tpu.cli import main

raise SystemExit(main())
