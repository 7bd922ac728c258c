"""Robot evaluation: policy adapters (SimplerEnv / WidowX), gripper
localization, SE(3) helpers."""
