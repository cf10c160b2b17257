from ft_fsd_path_planning_tpu.demo.json_demo import main

main()
