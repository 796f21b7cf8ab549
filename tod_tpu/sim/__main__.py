from tod_tpu.sim.loop import main

raise SystemExit(main())
