from acmmp_spherical_tpu.pipeline.cli import main

raise SystemExit(main())
